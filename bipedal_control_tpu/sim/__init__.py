from .dummy_loop import DummyLoopResult, run_dummy_loop
