from . import info_format, rotations
