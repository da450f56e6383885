"""On-device batched closed loop: MPC -> policy -> WBC -> physics, one program.

This is the BASELINE config-5 configuration ("N domain-randomized H1
scenarios per step"): the whole 50 Hz / 400-500 Hz cascade — SQP replan,
policy interpolation with Riccati feedback, whole-body QP, hybrid-joint PD,
compliant-contact rigid-body physics (sim/jax_physics.py) — runs as a single
jitted, vmapped XLA program.  No host round trips inside the episode; the
batch axis shards over a device mesh exactly like the batched solver
(parallel/batch_solver.py).

Deviations from the host loop, by design (documented, not hidden):
- gait/swing/target tables are frozen ONCE over the whole episode window on
  the host and sliced by time on device (cmd_vel targets re-derive from the
  live observation per replan — see make_batched_closed_loop);
- the per-replan node grids ARE event-snapped like the host's, but they are
  precomputed host-side for every replan index at build time (the episode
  schedule is known up front) and indexed inside the scan — the snapping
  logic itself (reference/manager.py::build_time_grid) never runs in jit;
- safety stop is a freeze-on-fall guard rather than the host loop's
  controller-stop branch (runtime/safety.py; SafetyChecker.h:23-52): once a
  scenario is detected fallen (base below ``fall_z_frac`` of its nominal
  standing height, tilt beyond ``fall_tilt``, or any non-finite state) its
  plant state is HELD at the last finite pre-fall snapshot for the rest of
  the episode.  vmapped lanes cannot branch, so the cascade still computes
  for frozen lanes, but post-fall numerics can no longer blow up to NaN and
  pollute the batch statistics (finite_frac < 1 in SCENARIOS_r04 was
  entirely this).  Survival stats are unchanged by construction: a frozen
  lane is frozen *because* it is fallen, so it counts dead either way.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..interface import RobotInterface
from ..runtime.mrt import evaluate_policy
from ..solver.sqp import build_refs, initial_trajectory, sqp_solve, warm_start_trajectories
from ..utils.precision import default_matmul_precision
from ..wbc.weighted_wbc import wbc_update
from .jax_physics import (
    JaxSimConfig,
    JaxSimState,
    hybrid_pd_torque_explicit,
    rbd_state_from_sim,
    sim_step,
)


@dataclasses.dataclass(frozen=True)
class BatchLoopConfig:
    duration: float = 1.0
    replan_dt: float = 0.02  # 50 Hz MPC
    control_dt: float = 0.002  # 500 Hz WBC/PD tick
    joint_kp: float = 80.0
    joint_kd: float = 5.0
    sim: JaxSimConfig = dataclasses.field(default_factory=JaxSimConfig)
    # freeze-on-fall guard (module docstring): fallen = base z below
    # fall_z_frac * nominal standing height, OR |roll|+|pitch| > fall_tilt,
    # OR non-finite state.  Set freeze_on_fall=False for the legacy
    # keep-integrating semantics.
    freeze_on_fall: bool = True
    fall_z_frac: float = 0.5
    fall_tilt: float = 1.5


class BatchLoopResult(NamedTuple):
    final_state: JaxSimState  # batched (B, ...)
    base_z_min: jnp.ndarray  # (B,) min base height over the episode
    tilt_max: jnp.ndarray  # (B,) max |roll|+|pitch| over the episode
    defect_last: jnp.ndarray  # (B,) last replan's dynamics defect
    fell: jnp.ndarray  # (B,) bool — freeze-on-fall guard tripped


def make_batched_closed_loop(
    iface: RobotInterface, cfg: BatchLoopConfig, wbc_cfg=None, gait: str | None = None,
    gait_at: float = 0.1, cmd_vel=None, cmd_vel_ki: float = 0.0,
    cmd_vel_kyaw: float = 0.0, cmd_vel_yaw_delay: float = 2.0,
    yaw_rate_max: float = 0.5,
):
    """Build the jitted episode function: (x0_batch (B, nx)) -> BatchLoopResult.

    The reference tables are frozen on the host over [0, duration+horizon]
    at build time (stance/constant-gait episodes use them as-is; periodic
    gaits — pass ``gait`` to splice one in at ``gait_at`` — tile within the
    window, so the on-device cascade *steps*).

    cmd_vel_ki: the host CmdVelFollower's forward-velocity-integral trim
    (reference/target.py), ported into the scan: per-lane trim integrated
    at the replan cadence, clamped to |cmd_vx|.  DEFAULT OFF (0.0) — the
    cascade retargets every REPLAN (20 ms) where the host retargets every
    250 ms, so the host's ki=1.2 is a ~12x hotter loop here, and the
    measured effect on the scenario axis is NET NEGATIVE: progressed_frac
    rises (0.57 -> 0.59-0.72) but upright_frac collapses
    (0.78 -> 0.42-0.61 across jitter scales, chip B=64/256 sweeps
    2026-08-22) — jittered robots get pushed harder and fall.  The
    progression deficit under jitter remains an open lead; a
    cadence-matched (slower) trim was not tried.

    cmd_vel_kyaw: the host CmdVelFollower heading hold ported into the
    scan (per-observation retargeting re-anchors the yaw reference at the
    measured yaw every replan, so heading performs a random walk and the
    world path curves — the documented OpenLoong drift mechanism): a
    scan-carried yaw reference integrates yaw_ref += cmd_yaw * replan_dt
    from the heading measured at engage time (cmd_vel_yaw_delay — engaging
    during the gait-start transient tips marginal robots, the host
    finding), and the commanded yaw rate is corrected by
    clip(kyaw * wrap(yaw_ref - yaw), +-yaw_rate_max).  Default off."""
    from ..runtime.controller import wbc_config_from_task

    model, info, settings = iface.model, iface.info, iface.settings
    Q, R = iface.Q, iface.R
    wbc_cfg = wbc_cfg or wbc_config_from_task(iface.task)

    rm = iface.make_reference_manager()
    # widen the frozen window to the whole episode + horizon
    rm.max_phases = max(rm.max_phases, int(8 * (cfg.duration + 2 * rm.horizon)) + 24)
    if gait is not None:
        rm.set_gait(iface.task.gait_library[gait], start_time=gait_at)
    # freeze over a window long enough for every replan in the episode
    rm.horizon = cfg.duration + iface.settings.horizon
    frozen = rm.freeze(0.0)
    gait_t, swing_t, target_t = frozen.gait, frozen.swing, frozen.target

    retarget = None
    if cmd_vel is not None:
        # Walking needs the host loop's cadence of re-targeting from the
        # CURRENT observation (TargetTrajectoriesPublisher.cpp:77-100
        # re-publishes against the observation topic; the envelope test does
        # it every 0.2 s).  A target frozen once at t=0 leaves the pose
        # reference anchored to the start state, so the robot trots in place.
        # cmdVelToTargetTrajectories is pure arithmetic — run it per replan
        # inside the scan on the device.
        from ..reference.target import TargetTable
        from ..utils.rotations import rotmat_from_zyx

        ccfg = iface.command_config
        cmd = jnp.asarray(np.asarray(cmd_vel, dtype=np.float64))
        default_joints = jnp.asarray(np.asarray(ccfg.default_joint_state))
        nx, nu = info.state_dim, info.input_dim
        reach = ccfg.target_reaching_duration

        # ki=0 disables the trim entirely (clamp collapses to 0)
        trim_lim = abs(float(np.asarray(cmd_vel)[0])) if cmd_vel_ki else 0.0

        def trim_update(trim, x_obs):
            # host CmdVelFollower trim integrator at the replan cadence:
            # forward-velocity error integrated with ki, clamped to |cmd_vx|
            yaw = x_obs[9]
            v_fwd = jnp.cos(yaw) * x_obs[0] + jnp.sin(yaw) * x_obs[1]
            return jnp.clip(
                trim + cmd_vel_ki * (cmd[0] - v_fwd) * cfg.replan_dt,
                -trim_lim, trim_lim,
            )

        def yaw_hold(t0, x_obs, yaw_ref, engaged):
            """(yaw_ref', engaged', yaw_rate_correction) — dead (zeros)
            when cmd_vel_kyaw == 0."""
            if not cmd_vel_kyaw:
                return yaw_ref, engaged, 0.0
            yaw = x_obs[9]
            on = t0 >= cmd_vel_yaw_delay
            # first engaged replan anchors the reference at the MEASURED yaw
            yaw_ref = jnp.where(
                on & ~engaged, yaw, yaw_ref + jnp.where(engaged, cmd[3] * cfg.replan_dt, 0.0)
            )
            err = (yaw_ref - yaw + jnp.pi) % (2 * jnp.pi) - jnp.pi
            corr = jnp.where(
                on, jnp.clip(cmd_vel_kyaw * err, -yaw_rate_max, yaw_rate_max), 0.0
            )
            return yaw_ref, on, corr

        def retarget(t0, x_obs, trim, yaw_corr=0.0):
            pose = x_obs[6:12]
            cmd_eff = cmd.at[0].add(trim).at[3].add(yaw_corr)
            v_world = rotmat_from_zyx(pose[3:6]) @ cmd_eff[:3]
            pose_now = jnp.array(
                [pose[0], pose[1], ccfg.com_height, pose[3], 0.0, 0.0]
            )
            pose_target = jnp.array(
                [
                    pose[0] + v_world[0] * reach,
                    pose[1] + v_world[1] * reach,
                    ccfg.com_height,
                    pose[3] + cmd_eff[3] * reach,
                    0.0,
                    0.0,
                ]
            )
            mk = lambda p: (
                jnp.zeros(nx).at[0:3].set(v_world).at[6:12].set(p).at[12:].set(default_joints)
            )
            return TargetTable(
                times=jnp.stack([t0, t0 + reach]),
                states=jnp.stack([mk(pose_now), mk(pose_target)]),
                inputs=jnp.zeros((2, nu)),
            )

    # lateral capture stepping on-device: same hook as the host fused replan
    # (runtime/mpc_runner.py) — swing hip-roll references biased from the
    # CURRENT episode observation at every replan inside the scan.  None for
    # robots without a captureStepping block (e.g. H1): dead code, traced out.
    from ..runtime.mpc_runner import make_capture_hook

    cap = getattr(iface.task, "capture", None)
    _cap_dq, cap_decay, cap_wshift = make_capture_hook(cap, info.nj)

    n_ticks = int(round(cfg.replan_dt / cfg.control_dt))
    n_sub = max(1, int(round(cfg.control_dt / cfg.sim.dt)))
    n_replans = int(round(cfg.duration / cfg.replan_dt))
    N1 = settings.num_intervals + 1
    horizon = settings.horizon

    # event-aligned node grid per replan index, precomputed host-side from
    # the frozen gait's event times (the host loop's build_time_grid
    # semantics; VERDICT r2 weak #7 — constraint switches land exactly on
    # shooting nodes instead of mid-interval)
    from ..reference.manager import build_time_grid

    ev = np.asarray(frozen.gait.event_times)
    grids = jnp.asarray(
        np.stack(
            [
                build_time_grid(k * cfg.replan_dt, horizon, settings.num_intervals, ev)
                for k in range(n_replans)
            ]
        )
    )  # (n_replans, N+1)

    # nominal standing height for the fall detector (static, host-side)
    z_fall = cfg.fall_z_frac * float(np.asarray(iface.initial_state)[8])

    def _is_fallen(sim_s):
        geom = (sim_s.q[2] < z_fall) | (
            jnp.abs(sim_s.q[4]) + jnp.abs(sim_s.q[5]) > cfg.fall_tilt
        )
        return geom | ~_is_finite(sim_s)

    def _is_finite(sim_s):
        return (
            jnp.all(jnp.isfinite(sim_s.q))
            & jnp.all(jnp.isfinite(sim_s.v))
            & jnp.all(jnp.isfinite(sim_s.anchor))
        )

    def episode(x0):
        from .jax_physics import initial_sim_state

        sim = initial_sim_state(model, info, x0)

        def obs(sim_state):
            from ..model.centroidal import centroidal_state_from_rbd

            return centroidal_state_from_rbd(model, info, rbd_state_from_sim(model, sim_state))

        # first solve (cold start) at t=0, on the k=0 event-aligned grid
        t_nodes0 = grids[0]
        x_obs0 = obs(sim)
        tgt0 = retarget(0.0, x_obs0, 0.0) if retarget is not None else target_t
        refs0 = build_refs(
            info, gait_t, swing_t, tgt0, t_nodes0,
            _cap_dq(gait_t, tgt0, t_nodes0, x_obs0), cap_decay, cap_wshift,
        )
        xs0, us0 = initial_trajectory(info, refs0, x_obs0, N1)
        sol0 = sqp_solve(model, info, settings, Q, R, refs0, t_nodes0, x_obs0, xs0, us0)

        def replan_body(carry, k):
            sim_state, fallen, trim, yaw_ref, engaged, t_nodes_prev, xs_prev, us_prev = carry
            t0 = k * cfg.replan_dt
            t_nodes = grids[k]
            x_obs = obs(sim_state)
            if retarget is not None:
                trim = trim_update(trim, x_obs)
                yaw_ref, engaged, yaw_corr = yaw_hold(t0, x_obs, yaw_ref, engaged)
                tgt = retarget(t0, x_obs, trim, yaw_corr)
            else:
                tgt = target_t
            refs = build_refs(
                info, gait_t, swing_t, tgt, t_nodes,
                _cap_dq(gait_t, tgt, t_nodes, x_obs), cap_decay, cap_wshift,
            )
            # re-align the previous solution onto the shifted grid (the host
            # path's warm_start_from_solution; without it every node's warm
            # start lags by one replan period)
            xs, us = warm_start_trajectories(t_nodes_prev, xs_prev, us_prev, t_nodes)
            sol = sqp_solve(model, info, settings, Q, R, refs, t_nodes, x_obs, xs, us)

            def tick_body(carry2, j):
                sim_s, down = carry2
                t = t0 + j * cfg.control_dt
                rbd = rbd_state_from_sim(model, sim_s)
                x_obs_t = obs(sim_s)
                pol = evaluate_policy(sol, t, x_obs_t, use_feedback=True)
                flags = gait_t.contact_flags_at(t)
                res = wbc_update(model, info, wbc_cfg, pol.x_star, pol.u_fb, rbd, flags)
                nj = info.nj
                tau_ff = res.decision[-nj:]
                pos_des = pol.x_star[12 : 12 + nj]
                vel_des = pol.u_fb[12:]

                def sub_body(s, _):
                    tau = hybrid_pd_torque_explicit(
                        pos_des, vel_des, cfg.joint_kp, cfg.joint_kd, tau_ff, s.q[6:]
                    )
                    s2, _ = sim_step(
                        model, info, cfg.sim, s, tau, joint_damping=cfg.joint_kd
                    )
                    return s2, None

                sim_new, _ = jax.lax.scan(sub_body, sim_s, None, length=n_sub)
                if cfg.freeze_on_fall:
                    # hold the last finite snapshot once fallen (vmapped
                    # lanes cannot branch, so this is a select, not a skip)
                    bad = ~_is_finite(sim_new)
                    sim_new = jax.tree_util.tree_map(
                        lambda a, b: jnp.where(down | bad, a, b), sim_s, sim_new
                    )
                    down = down | bad | _is_fallen(sim_new)
                metrics = jnp.array(
                    [sim_new.q[2], jnp.abs(sim_new.q[4]) + jnp.abs(sim_new.q[5])]
                )
                return (sim_new, down), metrics

            (sim_state, fallen), metrics = jax.lax.scan(
                tick_body, (sim_state, fallen), jnp.arange(n_ticks)
            )
            return (
                sim_state, fallen, trim, yaw_ref, engaged, t_nodes,
                sol.x_traj, sol.u_traj,
            ), (
                metrics[:, 0].min(),
                metrics[:, 1].max(),
                sol.defect_norm,
            )

        fallen0 = jnp.asarray(False)
        trim0 = jnp.asarray(0.0, x0.dtype)
        yaw_ref0 = jnp.asarray(0.0, x0.dtype)
        engaged0 = jnp.asarray(False)
        (sim, fell, *_), (zmins, tiltmaxs, defects) = jax.lax.scan(
            replan_body,
            (sim, fallen0, trim0, yaw_ref0, engaged0, t_nodes0, sol0.x_traj, sol0.u_traj),
            jnp.arange(n_replans),
        )
        return sim, zmins.min(), tiltmaxs.max(), defects[-1], fell

    def run(x0_batch):
        # Full-f32 matmuls: on TPU the bf16 dot default HALVES randomized
        # walking survival (utils/precision.py; SCENARIOS_r04.json sweep).
        # Per-robot matmulPrecision (overrides.info) can retune it.
        with default_matmul_precision(getattr(iface.task, "matmul_precision", None)):
            sims, zmin, tilt, defect, fell = jax.vmap(episode)(x0_batch)
        return BatchLoopResult(
            final_state=sims, base_z_min=zmin, tilt_max=tilt, defect_last=defect,
            fell=fell,
        )

    return jax.jit(run)


def randomized_initial_states(
    iface: RobotInterface, batch: int, seed: int = 0, scale: float = 1.0
):
    """Domain-randomized initial conditions around the task initial state:
    base position/orientation jitter + joint perturbations (the scenario
    axis of BASELINE config 5).  ``scale`` multiplies every jitter range
    (survival-vs-jitter sweeps, tools/scenario_survival.py)."""
    rng = np.random.default_rng(seed)
    x0 = np.asarray(iface.initial_state)
    X = np.tile(x0, (batch, 1))
    X[:, 6:8] += scale * rng.uniform(-0.05, 0.05, (batch, 2))  # base xy
    X[:, 8] += scale * rng.uniform(-0.01, 0.02, batch)  # base z
    X[:, 9:12] += scale * rng.uniform(-0.05, 0.05, (batch, 3))  # yaw/pitch/roll
    X[:, 12:] += scale * rng.uniform(-0.05, 0.05, (batch, x0.shape[0] - 12))
    return jnp.asarray(X)
