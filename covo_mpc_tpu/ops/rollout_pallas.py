"""Fused Pallas-TPU rollout kernel.

One kernel = the whole MPC rollout hot loop: H dynamics steps + reward +
termination-freeze + discounted cost accumulation for a tile of samples,
with ALL state resident in vector registers / VMEM. The jnp engine
(ops/rollout.py) round-trips the (N, 16) carry through XLA's scan plumbing
32 times per solve; here HBM traffic is exactly one read of the action
tensor and one write of the (N,) costs.

Layout strategy
---------------
Samples live on the VPU grid: a tile holds (8 sublanes x LANES) samples,
and every one of the 13 per-sample state components (pos 3, quat 4, vel 3,
omega 3) is an (8, LANES) slab — every VPU op is a full-tile op. Actions
are pre-arranged once by XLA to (H, 4, 8, N/8) so each step's load is an
aligned (8, LANES) slab. Everything shared across samples — targets,
disturbance, physics constants, the episode clock — is a scalar in SMEM.

The disturbance table trick: all rollout samples share the start state and
the reference reuses ONE step key for every sample and step (reference:
quadjax/controllers/mppi.py:69-74), so for every disturb type except
"drag"/"mixed" the force disturbance is state-independent and precomputes
to an (H, 3) table outside the kernel; f_disturb then never occupies
per-sample registers. The velocity-dependent "drag" and "mixed" models run
IN-KERNEL instead — drag is elementwise in the velocity slabs, and mixed's
sin/periodic components ride the table/scalars (build_kernel_disturb) —
so every disturbance model runs fused.

Semantics match ops/rollout.py `rollout_costs` exactly (pre-step rewards,
reward freezing on termination, pre-update-velocity position integration,
reference quirks and all); equivalence is pinned by
tests/test_pallas_rollout.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from covo_mpc_tpu.models import dynamics, scalar_core
from covo_mpc_tpu.models.quad_env import QuadEnv
from covo_mpc_tpu.models.structs import FDIST

SUB = 8  # VPU sublanes: samples per tile row


def _atan2(y, x):
    """Elementwise atan2 for the Pallas TPU backend (no native lowering).

    Octant range reduction + a degree-11 odd minimax polynomial for atan on
    [0, 1]; max abs error ~2e-7 vs the libm atan2 (pinned by
    tests/test_pallas_rollout.py), far inside the 2e-4 cost-parity budget.
    """
    ax, ay = jnp.abs(x), jnp.abs(y)
    amin = jnp.minimum(ax, ay)
    amax = jnp.maximum(ax, ay)
    a = amin / jnp.maximum(amax, 1e-30)
    s = a * a
    # minimax coefficients for atan(a), a in [0,1] (odd powers)
    r = jnp.float32(-0.0117212)
    r = r * s + jnp.float32(0.05265332)
    r = r * s + jnp.float32(-0.11643287)
    r = r * s + jnp.float32(0.19354346)
    r = r * s + jnp.float32(-0.33262348)
    r = r * s + jnp.float32(0.99997726)
    r = r * a
    pi = jnp.float32(3.14159265358979)
    r = jnp.where(ay > ax, pi / 2 - r, r)
    r = jnp.where(x < 0, pi - r, r)
    return jnp.where(y < 0, -r, r)
def _uniform01(shape):
    """In-kernel U[0,1) slab from the TPU hardware PRNG.

    Mantissa trick: 23 random bits OR'd under exponent 0x3F8 bitcast to a
    float in [1, 2), minus 1 — all integer VPU ops (mosaic has no
    uint32 -> f32 convert).
    """
    bits = pltpu.prng_random_bits(shape)
    mant = jnp.bitwise_and(bits, jnp.int32(0x007FFFFF))
    one = jnp.bitwise_or(mant, jnp.int32(0x3F800000))
    return pltpu.bitcast(one, jnp.float32) - 1.0


def _normals4(shape):
    """Four i.i.d. standard-normal slabs via two Box–Muller pairs.

    log/sqrt/sin/cos all lower natively on the TPU VPU; 1-u keeps the log
    argument in (0, 1]. Moments validated on hardware in
    tests/test_pallas_rollout.py (kernel-sampling statistics)."""
    two_pi = jnp.float32(6.283185307179586)
    out = []
    for _ in range(2):
        r = jnp.sqrt(-2.0 * jnp.log(1.0 - _uniform01(shape)))
        th = two_pi * _uniform01(shape)
        out += [r * jnp.cos(th), r * jnp.sin(th)]
    return out


def _normals3_scalar():
    """Three i.i.d. standard-normal SCALARS from the TPU hardware PRNG.

    For the shared gaussian disturbance draw ("krng" disturb mode): one
    (SUB, 128) Box–Muller tile, three elements picked out by masked
    full-tile reductions (Mosaic has no direct vector→scalar extract).
    Every grid block seeds the same dedicated stream first, so all
    blocks reconstruct the SAME three values — the reference's one
    shared draw per solve (mppi.py:69-74)."""
    shape = (SUB, 128)
    r = jnp.sqrt(-2.0 * jnp.log(1.0 - _uniform01(shape)))
    th = jnp.float32(6.283185307179586) * _uniform01(shape)
    n = r * jnp.cos(th)
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    pick = lambda j: jnp.sum(jnp.where((row == 0) & (col == j), n, 0.0))
    return pick(0), pick(1), pick(2)


def _normals_joint(d, shape2):
    """(d, *shape2) i.i.d. standard normals for the joint MVN draw: one
    Box–Muller pair per element, cos half and sin half stacked along the
    leading (tile-batch) axis — independent by construction, and the
    concat is a free tile-sequence join (no sublane/lane relayout)."""
    half = (d // 2,) + tuple(shape2)
    r = jnp.sqrt(-2.0 * jnp.log(1.0 - _uniform01(half)))
    th = jnp.float32(6.283185307179586) * _uniform01(half)
    return jnp.concatenate([r * jnp.cos(th), r * jnp.sin(th)], axis=0)


# scalar-pack layout (f32 SMEM); slots 10+ feed the in-kernel
# velocity-dependent disturbance models (drag / mixed)
(_M, _G, _DT, _ALPHA, _ASCALE, _MAX_THRUST, _MO0, _MO1, _MO2, _DISCOUNT,
 _DSCALE, _DP0, _DP1, _DP2, _DRAW0, _DRAW1, _DRAW2) = range(17)
NSCAL = 17
NINT = 3  # [t0, max_steps, disturb_period]


def _disturb_mode(env: QuadEnv, kernel_draw: bool = False) -> str:
    """Kernel disturbance mode for ``env`` — the ONE definition shared by
    every engine builder (drift risk: the krng in-kernel draw exists only
    where ``kernel_draw=True`` is passed — currently the single-scenario
    sampling builder; the batched/sharded builders keep the XLA-side
    "shared" draw, whose per-scenario cost is amortized over B)."""
    dtype = env.config.disturb_type
    if dtype in ("drag", "mixed"):
        return dtype
    if dtype in ("gaussian", "none"):
        return "krng" if kernel_draw else "shared"
    return "table"


def _lane_blocks(N: int):
    """(N_pad, lanes, LB) tile geometry shared by every engine builder.

    The sample axis pads to whole (SUB, 128) tiles; the lane-block size
    must DIVIDE lanes or the tail blocks are never computed
    (grid = lanes // LB): N % 1024 == 0 guarantees lanes % 128 == 0, so
    halving from 512 always terminates."""
    TILE = SUB * 128
    N_pad = -(-N // TILE) * TILE
    lanes = N_pad // SUB
    LB = min(512, lanes)
    while lanes % LB:
        LB //= 2
    return N_pad, lanes, LB



def build_disturb_table(env: QuadEnv, x0, t0, params, step_key, deterministic,
                        H, fast_keys: bool = False):
    """(H, 3) table: the f_disturb in effect during step h.

    Step 0 integrates with the start state's own disturbance; step h >= 1
    with the value the disturbance model produced at time t0 + h - 1
    (reference: free.py:147 updates AFTER integrating).
    """
    dtype = env.config.disturb_type
    params = params.replace(
        dyn_noise_scale=params.dyn_noise_scale * (1.0 - deterministic)
    )
    disturb_key = dynamics.derive_dynamics_keys(step_key, fast=fast_keys)
    f0 = x0[FDIST]
    disturb_fn = env.disturb_fn

    if dtype in ("gaussian", "none"):
        # one shared draw, constant across steps (key reuse quirk)
        d = disturb_fn(disturb_key, params, t0, None, jnp.zeros(3))
        rest = jnp.broadcast_to(d, (H - 1, 3))
        return jnp.concatenate([f0[None], rest], axis=0)

    # periodic / sin: state-independent recurrence over the shared clock
    def step(f_prev, h):
        f = disturb_fn(disturb_key, params, t0 + h, None, f_prev)
        return f, f
    _, fs = jax.lax.scan(step, f0, jnp.arange(H - 1))
    return jnp.concatenate([f0[None], fs], axis=0)


def build_kernel_disturb(env: QuadEnv, x0, t0, params, step_key,
                         deterministic, H, fast_keys: bool = False,
                         kernel_draw: bool = False):
    """Disturbance inputs for the fused kernel: ``(table (H,3), draw (3,))``.

    For state-independent models the table holds the f_disturb in effect
    during each step (``build_disturb_table``) and the kernel reads it
    directly. The velocity-dependent models run IN-KERNEL on per-sample
    velocity slabs instead:

      * "drag": f = -|scale| * rel_v * |rel_v| / 1.5^2 with
        rel_v = v - disturb_params[:3]/2 (reference: free.py:41-47);
        the table is unused (zeros), the carry starts from x0's f_disturb.
      * "mixed": (drag + sin + periodic)/3 (reference: free.py:50-56).
        The sin component is a closed form of the shared clock — the
        table holds sin(t0+h); the periodic component re-draws every
        `disturb_period` steps and otherwise passes the PREVIOUS mixed
        value through, so it rides the in-kernel carry; the draw itself
        is shared across steps (the reference reuses one step key,
        mppi.py:69-74) and enters as a scalar.
    """
    dtype = env.config.disturb_type
    if dtype in ("gaussian", "none"):
        # the whole (H, 3) table is [f0, d, d, ...]: f0 already rides in
        # x0[13:16] and the one shared draw d fits the scal draw lanes, so
        # the kernel reconstructs it for free ("shared" mode) — building
        # and re-materializing the table into the SMEM operand every solve
        # measured ~10 us of the 62 us kernel-rng MPPI solve (solve-level
        # A/B, DESIGN.md §5 kernel table)
        params = params.replace(
            dyn_noise_scale=params.dyn_noise_scale * (1.0 - deterministic)
        )
        if deterministic is True or dtype == "none":
            # static deterministic (both types) and "none" outright:
            # the draw is statically zero — skip the key chain + draw
            # (for "none" the old path still ran the threefry chain /
            # the in-kernel draw tiles just to multiply by 0)
            return jnp.zeros((H, 3), jnp.float32), jnp.zeros(3, jnp.float32)
        if kernel_draw:
            # "krng" disturb mode: the kernel draws the shared normals
            # itself from its second seed stream — no XLA-side key chain
            # or threefry at all; _DRAW0 carries only the effective scale
            # (a params constant when `deterministic` is static, leaving
            # the whole scal operand static and hoistable)
            eff = (params.dyn_noise_scale
                   if dtype == "gaussian" else jnp.float32(0.0))
            draw = jnp.stack([jnp.asarray(eff, jnp.float32),
                              jnp.float32(0.0), jnp.float32(0.0)])
            return jnp.zeros((H, 3), jnp.float32), draw
        disturb_key = dynamics.derive_dynamics_keys(step_key, fast=fast_keys)
        d = env.disturb_fn(disturb_key, params, t0, None, jnp.zeros(3))
        return jnp.zeros((H, 3), jnp.float32), d
    if dtype not in ("drag", "mixed"):
        table = build_disturb_table(env, x0, t0, params, step_key,
                                    deterministic, H, fast_keys)
        return table, jnp.zeros(3, jnp.float32)

    disturb_key = dynamics.derive_dynamics_keys(step_key, fast=fast_keys)
    draw = jax.random.uniform(
        disturb_key, (3,), minval=-params.disturb_scale,
        maxval=params.disturb_scale,
    )
    if dtype == "drag":
        return jnp.zeros((H, 3), jnp.float32), draw
    times = t0 + jnp.arange(H)
    sins = jax.vmap(
        lambda t: dynamics.sin_disturb(None, params, t, None, jnp.zeros(3))
    )(times)
    return sins, draw


def _pack_kernel_inputs(env, x0, t0, pos_traj, vel_traj, params, step_key,
                        deterministic, discount, H, fast_keys: bool = False,
                        kernel_draw: bool = False):
    """Flattened SMEM operands shared by both rollout kernels:
    (ptar, vtar, disturbance table, scal (NSCAL,), ints (NINT,))."""
    T = pos_traj.shape[0]
    idx = jnp.clip(t0 + jnp.arange(H), 0, T - 1)
    ptar = pos_traj[idx].reshape(-1)
    vtar = vel_traj[idx].reshape(-1)
    table, draw = build_kernel_disturb(
        env, x0, t0, params, step_key, deterministic, H, fast_keys,
        kernel_draw=kernel_draw,
    )
    dp = params.disturb_params
    # the 14 static lanes get their OWN stack: params/discount are loop
    # constants in a chained control loop, so XLA hoists this whole chain
    # out of the scan; folding the per-solve draw into the same stack
    # taints all 17 lanes and re-runs ~10 tiny stack ops every solve
    # (trace-measured 15 us of the 62 us MPPI solve, scripts/kernel_ab.py)
    scal_static = jnp.stack(
        [
            params.m, params.g, jnp.float32(env._dt), params.alpha_bodyrate,
            params.action_scale, params.max_thrust,
            params.max_omega[0], params.max_omega[1], params.max_omega[2],
            jnp.float32(discount),
            params.disturb_scale, dp[0], dp[1], dp[2],
        ]
    ).astype(jnp.float32)
    scal = jnp.concatenate([scal_static, draw.astype(jnp.float32)])
    ints_static = jnp.array(
        [params.max_steps_in_episode, params.disturb_period], jnp.int32
    )
    ints = jnp.concatenate(
        [jnp.asarray(t0, jnp.int32)[None], ints_static]
    )
    return ptar, vtar, table.reshape(-1), scal, ints


def _dyn_step(state, action, fdist, m, g, dt, alpha, ascale, max_thrust, mo):
    """One bodyrate dynamics step on unpacked state components
    (reference: free.py:75-112 with step_env's action clip folded in,
    quadrotor.py:223/258). The physics itself is the single definition in
    models/scalar_core (shared with the jnp engine and the Hessian); this
    wrapper folds in the normalized-action -> (thrust, omega_tar) map.
    Components may be scalars or slabs — every op is elementwise, so the
    same code serves the N-sample tile kernel and the single-trajectory
    primal kernel."""
    a0 = jnp.clip(action[0], -1.0, 1.0)
    a1 = jnp.clip(action[1], -1.0, 1.0)
    a2 = jnp.clip(action[2], -1.0, 1.0)
    a3 = jnp.clip(action[3], -1.0, 1.0)
    thrust = (a0 + 1.0) * 0.5 * max_thrust * ascale
    wtx = a1 * mo[0] * ascale
    wty = a2 * mo[1] * ascale
    wtz = a3 * mo[2] * ascale
    return scalar_core.bodyrate_step(
        state, thrust, (wtx, wty, wtz), fdist, m, g, dt, alpha
    )


def _rollout_kernel(
    # SMEM (flattened with a per-scenario stride when batched)
    x0_ref,  # (B*16,) f32
    scal_ref,  # (B*NSCAL,) f32, see _M.._DRAW2
    int_ref,  # (B*NINT,) i32: [t0, max_steps, disturb_period]
    ptar_ref,  # (B*H*3,) f32
    vtar_ref,  # (B*H*3,) f32
    dist_ref,  # (B*H*3,) f32; per-step f table, or sin table for "mixed"
    # VMEM (sampling mode replaces act_ref with mean/chol/gen + act out:
    #   mean_ref (H*4,) SMEM, chol_ref (H*16,) SMEM row-major lower-tri
    #   per step ["prng"/"input_z"] or the full (D,D) VMEM factor
    #   ["*_joint"], gen_ref = seed (1,) i32 SMEM [prng] or z VMEM
    #   [input_z], cost_ref out, act_out_ref (H,4,SUB,LB) out; batched
    #   adds the scenario stride / leading block dim of 1 throughout)
    *refs,
    H: int,
    reward_name: str,
    check_rollover: bool,
    disturb_mode: str = "table",
    batched: bool = False,
    sample: str = "",
):
    if sample:
        mean_ref, chol_ref, gen_ref, cost_ref, act_out_ref = refs
        act_ref = None
    else:
        act_ref, cost_ref = refs
    if batched:
        # grid = (scenarios, lane tiles); scalar tables are scenario-strided
        b = pl.program_id(0)
        xo, so, io, to = b * 16, b * NSCAL, b * NINT, b * (H * 3)
        act = (lambda h, j: act_ref[0, h, j]) if act_ref is not None else None
        shape = cost_ref.shape[1:]
    else:
        xo = so = io = to = 0
        act = (lambda h, j: act_ref[h, j]) if act_ref is not None else None
        shape = cost_ref.shape
    if sample:
        # scenario-strided mean/chol tables; leading block dim of 1 on the
        # VMEM refs when batched (same convention as act_ref/cost_ref)
        m_off = b * (4 * H) if batched else 0
        c_off = b * (16 * H) if batched else 0
        if sample in ("prng", "prng_joint"):
            if disturb_mode == "krng":
                # shared gaussian disturbance drawn IN-KERNEL: seed a
                # dedicated stream (same value in every block -> same
                # draw everywhere), pull 3 normals, then fall through to
                # the per-block sample seeding below. Removes the last
                # XLA-side per-solve threefry chain (~6 us of serial
                # small ops) and leaves the scal operand fully static.
                pltpu.prng_seed(gen_ref[1])
                _dn0, _dn1, _dn2 = _normals3_scalar()
            # per-(scenario, block) stream: same seed + grid index ->
            # disjoint streams. The TPU PRNG accepts at most TWO seed
            # values (Mosaic: "Setting seed with more than 2 values is
            # not supported" — a hardware-compile error the interpret-mode
            # CPU tests do not catch), so the batched kernel folds
            # (scenario, lane-tile) injectively into one 32-bit index.
            if batched:
                pltpu.prng_seed(
                    gen_ref[0], b * pl.num_programs(1) + pl.program_id(1)
                )
            else:
                pltpu.prng_seed(gen_ref[0], pl.program_id(0))
    m = scal_ref[so + _M]
    g = scal_ref[so + _G]
    dt = scal_ref[so + _DT]
    alpha = scal_ref[so + _ALPHA]
    ascale = scal_ref[so + _ASCALE]
    max_thrust = scal_ref[so + _MAX_THRUST]
    mo = (scal_ref[so + _MO0], scal_ref[so + _MO1], scal_ref[so + _MO2])
    discount = scal_ref[so + _DISCOUNT]
    t0 = int_ref[io + 0]
    max_steps = int_ref[io + 1]
    period = int_ref[io + 2]

    def bc(s):  # broadcast scalar to the sample tile
        return jnp.full(shape, s, dtype=jnp.float32)

    px, py, pz = bc(x0_ref[xo + 0]), bc(x0_ref[xo + 1]), bc(x0_ref[xo + 2])
    qx, qy, qz, qw = (
        bc(x0_ref[xo + 3]), bc(x0_ref[xo + 4]),
        bc(x0_ref[xo + 5]), bc(x0_ref[xo + 6]),
    )
    vx, vy, vz = bc(x0_ref[xo + 7]), bc(x0_ref[xo + 8]), bc(x0_ref[xo + 9])
    wx, wy, wz = bc(x0_ref[xo + 10]), bc(x0_ref[xo + 11]), bc(x0_ref[xo + 12])
    if disturb_mode in ("drag", "mixed"):
        # velocity-dependent disturbance: per-sample carry from x0's f
        fdx, fdy, fdz = (
            bc(x0_ref[xo + 13]), bc(x0_ref[xo + 14]), bc(x0_ref[xo + 15])
        )
        abs_ds = jnp.abs(scal_ref[so + _DSCALE])
        wind = (scal_ref[so + _DP0], scal_ref[so + _DP1], scal_ref[so + _DP2])
        draw = (
            scal_ref[so + _DRAW0], scal_ref[so + _DRAW1], scal_ref[so + _DRAW2]
        )
    elif disturb_mode == "shared":
        # gaussian/none: step 0 integrates with x0's own f, every later
        # step with the one shared draw (key-reuse quirk) — the values a
        # "table" build would hold, read straight from x0/scal instead
        f0 = (x0_ref[xo + 13], x0_ref[xo + 14], x0_ref[xo + 15])
        draw = (
            scal_ref[so + _DRAW0], scal_ref[so + _DRAW1], scal_ref[so + _DRAW2]
        )
    elif disturb_mode == "krng":
        # same semantics as "shared" but the draw came from the in-kernel
        # stream above; _DRAW0 carries the effective noise scale
        # (dyn_noise_scale * (1 - deterministic); 0 for disturb "none")
        f0 = (x0_ref[xo + 13], x0_ref[xo + 14], x0_ref[xo + 15])
        eff = scal_ref[so + _DRAW0]
        draw = (eff * _dn0, eff * _dn1, eff * _dn2)

    cost = jnp.zeros(shape, dtype=jnp.float32)
    r_prev = jnp.zeros(shape, dtype=jnp.float32)
    d_prev = jnp.zeros(shape, dtype=jnp.bool_)
    disc = jnp.float32(1.0)

    if sample.endswith("_joint"):
        # joint (H·dA)-dim MVN correlation (CoVO, solvers/covo.py:266-280):
        # one MXU contraction a3[e] = Σ_d factor[e,d] z[d] over the full
        # horizon replaces the per-step Cholesky chain; chol_ref holds the
        # FULL (D, D) factor (not triangular — the Σ-designer's factor),
        # per-scenario as a (1, D, D) VMEM block when batched
        if sample == "prng_joint":
            z = _normals_joint(4 * H, shape)
        else:
            z = gen_ref[0] if batched else gen_ref[...]
        fac = chol_ref[0] if batched else chol_ref[...]
        a3 = jax.lax.dot_general(
            fac, z, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    for h in range(H):
        ptx = ptar_ref[to + 3 * h]
        pty = ptar_ref[to + 3 * h + 1]
        ptz = ptar_ref[to + 3 * h + 2]
        if disturb_mode == "table":
            fdx = dist_ref[to + 3 * h]
            fdy = dist_ref[to + 3 * h + 1]
            fdz = dist_ref[to + 3 * h + 2]
        elif disturb_mode in ("shared", "krng"):
            fdx, fdy, fdz = f0 if h == 0 else draw  # h static: free select

        # ---- reward on the PRE-step state (reference: quadrotor.py:243);
        # single definition in models/scalar_core, polynomial atan2 injected
        # (no atan2 lowering on Pallas TPU)
        if reward_name == "penyaw":
            vtx = vtar_ref[to + 3 * h]
            vty = vtar_ref[to + 3 * h + 1]
            vtz = vtar_ref[to + 3 * h + 2]
            r = scalar_core.penyaw_reward(
                (px, py, pz), (vx, vy, vz), (qx, qy, qz, qw),
                (ptx, pty, ptz), (vtx, vty, vtz), atan2=_atan2,
                norm=scalar_core.norm3_elementwise,
            )
        else:  # realworld quadratic cost
            r = scalar_core.realworld_reward((px, py, pz), qw, (ptx, pty, ptz))

        r = jnp.where(d_prev, r_prev, r)
        r_prev = r
        cost = cost - disc * r  # cost = -discounted reward sum
        disc = disc * discount

        # ---- termination on the pre-step state (reference: quadrotor.py:479-490)
        d_now = (
            (jnp.abs(px) > 3.0) | (jnp.abs(py) > 3.0) | (jnp.abs(pz) > 3.0)
        )
        if check_rollover:
            d_now = d_now | (qw < 0.70710678) | (
                (jnp.abs(wx) > 100.0) | (jnp.abs(wy) > 100.0) | (jnp.abs(wz) > 100.0)
            )
        time_up = (t0 + h) >= max_steps  # scalar, broadcasts
        d_prev = d_prev | d_now | time_up

        # ---- velocity-dependent disturbance update (drag / mixed):
        # f for the NEXT step comes from the PRE-step velocity
        # (reference: free.py:147 updates after integrating with the
        # carried f; free.py:41-56). Elementwise on the velocity slabs.
        if disturb_mode in ("drag", "mixed"):
            relx, rely, relz = (
                vx - wind[0] * 0.5, vy - wind[1] * 0.5, vz - wind[2] * 0.5
            )
            drx = -abs_ds * relx * jnp.abs(relx) / 2.25
            dry = -abs_ds * rely * jnp.abs(rely) / 2.25
            drz = -abs_ds * relz * jnp.abs(relz) / 2.25
            if disturb_mode == "drag":
                fdnx, fdny, fdnz = drx, dry, drz
            else:  # mixed = (drag + sin + periodic) / 3; sin rides dist_ref,
                # periodic re-draws every `period` steps else passes the
                # previous mixed value through (per-sample)
                redraw = ((t0 + h) % period) == 0  # scalar, broadcasts
                perx = jnp.where(redraw, bc(draw[0]), fdx)
                pery = jnp.where(redraw, bc(draw[1]), fdy)
                perz = jnp.where(redraw, bc(draw[2]), fdz)
                fdnx = (drx + dist_ref[to + 3 * h] + perx) / 3.0
                fdny = (dry + dist_ref[to + 3 * h + 1] + pery) / 3.0
                fdnz = (drz + dist_ref[to + 3 * h + 2] + perz) / 3.0

        # ---- actions: fetched (plain mode) or sampled in-kernel
        # a_h = clip(mean_h + L_h z_h) with L the per-step Cholesky —
        # identical correlation to ops/sampling.sample_per_step_t, drawn
        # from the TPU PRNG instead of threefry (reference semantics:
        # mppi.py:53-65; the clip is step_env's, quadrotor.py:223)
        if sample.endswith("_joint"):
            mh = lambda d: mean_ref[m_off + 4 * h + d]
            a_h = tuple(
                jnp.clip(a3[4 * h + d] + mh(d), -1.0, 1.0) for d in range(4)
            )
            for d in range(4):
                if batched:
                    act_out_ref[0, h, d] = a_h[d]
                else:
                    act_out_ref[h, d] = a_h[d]
        elif sample:
            if sample == "prng":
                z0, z1, z2, z3 = _normals4(shape)
            elif batched:  # "input_z", scenario-batched
                z0, z1, z2, z3 = (gen_ref[0, h, j] for j in range(4))
            else:  # "input_z": XLA-drawn normals (interpret/CPU tests)
                z0, z1, z2, z3 = (gen_ref[h, j] for j in range(4))
            c = lambda j: chol_ref[c_off + 16 * h + j]
            mh = lambda d: mean_ref[m_off + 4 * h + d]
            a_h = (
                mh(0) + c(0) * z0,
                mh(1) + c(4) * z0 + c(5) * z1,
                mh(2) + c(8) * z0 + c(9) * z1 + c(10) * z2,
                mh(3) + c(12) * z0 + c(13) * z1 + c(14) * z2 + c(15) * z3,
            )
            a_h = tuple(jnp.clip(a, -1.0, 1.0) for a in a_h)
            for d in range(4):
                if batched:
                    act_out_ref[0, h, d] = a_h[d]
                else:
                    act_out_ref[h, d] = a_h[d]
        else:
            a_h = (act(h, 0), act(h, 1), act(h, 2), act(h, 3))

        # ---- dynamics (reference: free.py:75-112)
        (px, py, pz, qx, qy, qz, qw, vx, vy, vz, wx, wy, wz) = _dyn_step(
            (px, py, pz, qx, qy, qz, qw, vx, vy, vz, wx, wy, wz),
            a_h,
            (fdx, fdy, fdz),
            m, g, dt, alpha, ascale, max_thrust, mo,
        )
        if disturb_mode in ("drag", "mixed"):
            fdx, fdy, fdz = fdnx, fdny, fdnz

    if batched:
        cost_ref[0, :, :] = cost
    else:
        cost_ref[:, :] = cost


def make_pallas_rollout(env: QuadEnv, interpret: bool = False,
                        fast_keys: bool = False):
    """Build the fused rollout-cost engine. Same contract as
    ops.rollout.make_rollout's `rollout_costs` (fast path: no pose
    collection). Supports every disturbance model (velocity-dependent
    "drag"/"mixed" run in-kernel on the velocity slabs; the rest ride a
    precomputed table — see build_kernel_disturb) and any N (ragged
    sample counts are tile-padded).
    """
    reward_name = env.reward_name
    check_rollover = not env.config.disable_rollover_terminate
    disturb_mode = _disturb_mode(env)

    def rollout_costs(
        x0, t0, pos_traj, vel_traj, actions, params, step_key,
        deterministic: bool = False, discount=1.0, collect_poses: bool = False,
        vma=(), layout: str = "nhd",
    ):
        """``vma``: mesh axes the output varies over — required when the
        kernel runs inside shard_map (check_vma demands an explicit
        declaration on pallas out_shapes; inputs are promoted by the
        caller, covo_mpc_tpu.parallel.sharded.make_cost_engine).

        ``layout``: "nhd" = actions (N, H, dA) (the jnp-engine contract,
        transposed here); "hdn" = actions (H, dA, N) or (H*dA, N) already
        in kernel layout (what ops/sampling.sample_*_t emit) — skips the
        4 MB transpose on the hot path."""
        if collect_poses:
            raise NotImplementedError("pallas engine does not collect poses")
        if layout == "nhd":
            N, H, dA = actions.shape
        else:
            actions = actions.reshape(-1, 4, actions.shape[-1])
            H, dA, N = actions.shape
        assert dA == 4, f"pallas rollout needs action_dim=4, got {dA}"
        # tile alignment: pad the sample axis up to a whole (8, 128) tile
        # with zero actions and slice their costs away — a single tile
        # computes 1024 samples regardless, so small/ragged N costs nothing
        # extra (enables the fused engine for the N-ablation's N=16..512)
        N_pad, lanes, LB = _lane_blocks(N)
        if N_pad != N:
            pad_shape = (
                (N_pad - N, H, dA) if layout == "nhd" else (H, dA, N_pad - N)
            )
            actions = jnp.concatenate(
                [actions, jnp.zeros(pad_shape, actions.dtype)],
                axis=0 if layout == "nhd" else -1,
            )

        ptar, vtar, dist, scal, ints = _pack_kernel_inputs(
            env, x0, t0, pos_traj, vel_traj, params, step_key,
            deterministic, discount, H, fast_keys,
        )

        # -> (H, 4, SUB, lanes); sample n sits at
        # (sub, lane) = divmod-free n = sub * lanes + lane
        if layout == "nhd":
            acts = actions.transpose(1, 2, 0).reshape(H, dA, SUB, lanes)
        else:
            acts = actions.reshape(H, dA, SUB, lanes)

        kernel = functools.partial(
            _rollout_kernel,
            H=H,
            reward_name=reward_name,
            check_rollover=check_rollover,
            disturb_mode=disturb_mode,
        )
        costs2d = pl.pallas_call(
            kernel,
            grid=(lanes // LB,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # x0
                pl.BlockSpec(memory_space=pltpu.SMEM),  # scal
                pl.BlockSpec(memory_space=pltpu.SMEM),  # ints
                pl.BlockSpec(memory_space=pltpu.SMEM),  # ptar
                pl.BlockSpec(memory_space=pltpu.SMEM),  # vtar
                pl.BlockSpec(memory_space=pltpu.SMEM),  # dist
                pl.BlockSpec(
                    (H, dA, SUB, LB),
                    lambda i: (0, 0, 0, i),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (SUB, LB), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct(
                (SUB, lanes), jnp.float32,
                **({"vma": frozenset(vma)} if vma else {}),
            ),
            interpret=interpret,
        )(x0[:16], scal, ints, ptar, vtar, dist, acts)

        return costs2d.reshape(N_pad)[:N], None

    return rollout_costs


def make_pallas_rollout_sampling(env: QuadEnv, interpret: bool = False,
                                 fast_keys: bool = False):
    """Fused SAMPLE + rollout engine: the per-step MVN action draw runs
    inside the rollout kernel, so neither the (H, dA, N) standard-normal
    tensor nor a separately-materialized action tensor ever crosses HBM on
    the way in (solve-level A/B: the XLA sampler chain costs ~75 us of a
    127 us MPPI solve at N=8192 — threefry bit-gen + two 4 MB round
    trips). The sampled (clipped) actions come back as a kernel OUTPUT for
    the weighted mean/cov updates.

    On TPU the normals come from the hardware PRNG (Box–Muller, seeded
    from the caller's key + block index); draws therefore differ from the
    jnp samplers — this is a distinct rng mode (ops/sampling.KERNEL), not
    a drop-in for parity/fast. Off-TPU (interpret) the kernel consumes
    XLA-drawn normals instead ("input_z"), which pins the correlate +
    rollout + output logic against the jnp reference path exactly
    (tests/test_pallas_rollout.py).

    Returns ``rollout_sample(x0, t0, pos_traj, vel_traj, a_mean (H, dA),
    chol (H, dA, dA), params, step_key, act_key, N, deterministic,
    discount, vma=()) -> (costs (N,), a_t (H*dA, N))``.
    """
    reward_name = env.reward_name
    check_rollover = not env.config.disable_rollover_terminate
    gen = "input_z" if (interpret or jax.default_backend() != "tpu") else "prng"
    # hardware path + gaussian: the shared disturbance draw moves
    # IN-KERNEL ("krng" mode) — a distinct stream from the jnp/interpret
    # engines (like the kernel action draw itself), quality-gated in
    # RESULTS.md. Off-TPU keeps the XLA-side draw ("shared"); "none"
    # stays "shared" too — its draw is statically zero, so the krng
    # tiles would be pure dead work (r5 review finding).
    kernel_draw = gen == "prng" and env.config.disturb_type == "gaussian"
    disturb_mode = _disturb_mode(env, kernel_draw=kernel_draw)

    def rollout_sample(
        x0, t0, pos_traj, vel_traj, a_mean, chol, params, step_key, act_key,
        N: int, deterministic: bool = False, discount=1.0, vma=(),
    ):
        H, dA = a_mean.shape
        assert dA == 4, f"pallas sampling rollout needs action_dim=4, got {dA}"
        N_pad, lanes, LB = _lane_blocks(N)

        ptar, vtar, dist, scal, ints = _pack_kernel_inputs(
            env, x0, t0, pos_traj, vel_traj, params, step_key,
            deterministic, discount, H, fast_keys,
            kernel_draw=kernel_draw,
        )
        if gen == "prng":
            # any 32 bits of each key: the kernel PRNG needs i32 seeds —
            # [0] the per-block sample stream, [1] (krng disturb mode)
            # the shared disturbance stream
            word = lambda key: jax.lax.bitcast_convert_type(
                jax.random.key_data(key).reshape(-1)[-1:], jnp.int32
            )
            gen_arg = (jnp.concatenate([word(act_key), word(step_key)])
                       if disturb_mode == "krng" else word(act_key))
            gen_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        else:
            gen_arg = jax.random.normal(
                act_key, (H, dA, SUB, lanes), jnp.float32
            )
            gen_spec = pl.BlockSpec(
                (H, dA, SUB, LB), lambda i: (0, 0, 0, i),
                memory_space=pltpu.VMEM,
            )

        kernel = functools.partial(
            _rollout_kernel,
            H=H,
            reward_name=reward_name,
            check_rollover=check_rollover,
            disturb_mode=disturb_mode,
            sample=gen,
        )
        kw = {"vma": frozenset(vma)} if vma else {}
        costs2d, acts = pl.pallas_call(
            kernel,
            grid=(lanes // LB,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # x0
                pl.BlockSpec(memory_space=pltpu.SMEM),  # scal
                pl.BlockSpec(memory_space=pltpu.SMEM),  # ints
                pl.BlockSpec(memory_space=pltpu.SMEM),  # ptar
                pl.BlockSpec(memory_space=pltpu.SMEM),  # vtar
                pl.BlockSpec(memory_space=pltpu.SMEM),  # dist
                pl.BlockSpec(memory_space=pltpu.SMEM),  # mean
                pl.BlockSpec(memory_space=pltpu.SMEM),  # chol
                gen_spec,
            ],
            out_specs=[
                pl.BlockSpec((SUB, LB), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H, dA, SUB, LB), lambda i: (0, 0, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((SUB, lanes), jnp.float32, **kw),
                jax.ShapeDtypeStruct((H, dA, SUB, lanes), jnp.float32, **kw),
            ],
            interpret=interpret,
        )(
            x0[:16], scal, ints, ptar, vtar, dist,
            a_mean.reshape(-1).astype(jnp.float32),
            chol.reshape(-1).astype(jnp.float32),
            gen_arg,
        )
        # sample n sits at (sub, lane) = n // lanes, n % lanes -> C-order
        return (
            costs2d.reshape(N_pad)[:N],
            acts.reshape(H * dA, N_pad)[:, :N],
        )

    return rollout_sample


def make_pallas_rollout_joint_sampling(env: QuadEnv, interpret: bool = False,
                                       fast_keys: bool = False):
    """Fused JOINT sample + rollout engine for CoVO: the (H·dA)-dimensional
    MVN draw a = clip(mean + F z) runs inside the rollout kernel — z comes
    from the TPU hardware PRNG and the correlation F z is one MXU
    contraction per lane tile, so neither the (D, N) standard-normal
    tensor nor the action tensor crosses HBM on the way in (the XLA
    sampler chain — threefry + factor matmul + two 4 MB round trips — is
    the same ~40-75 us tax the per-step kernel already eliminated for
    MPPI). ``factor`` is the Σ-designer's full (D, D) factor, not assumed
    triangular (reference sampling semantics: covo.py:212-221).

    Off-TPU (interpret) the kernel consumes XLA-drawn normals ("input_z"),
    pinning correlate + clip + rollout + output against the jnp path
    exactly (tests/test_pallas_rollout.py).

    Returns ``rollout_sample(x0, t0, pos_traj, vel_traj, a_mean (H, dA),
    factor (D, D), params, step_key, act_key, N, deterministic, discount,
    vma=()) -> (costs (N,), a_t (D, N))``.
    """
    reward_name = env.reward_name
    check_rollover = not env.config.disable_rollover_terminate
    disturb_mode = _disturb_mode(env)
    gen = "input_z" if (interpret or jax.default_backend() != "tpu") else "prng"

    def rollout_sample(
        x0, t0, pos_traj, vel_traj, a_mean, factor, params, step_key,
        act_key, N: int, deterministic: bool = False, discount=1.0, vma=(),
    ):
        H, dA = a_mean.shape
        assert dA == 4, f"pallas sampling rollout needs action_dim=4, got {dA}"
        D = H * dA
        # (D, SUB, LB) z + a3 + act-out blocks at LB=512, D=128 are 3 x 2 MB
        # of VMEM — fits; halve LB in _lane_blocks if D ever grows past 128
        N_pad, lanes, LB = _lane_blocks(N)

        ptar, vtar, dist, scal, ints = _pack_kernel_inputs(
            env, x0, t0, pos_traj, vel_traj, params, step_key,
            deterministic, discount, H, fast_keys,
        )
        if gen == "prng":
            gen_arg = jax.lax.bitcast_convert_type(
                jax.random.key_data(act_key).reshape(-1)[-1:], jnp.int32
            )
            gen_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        else:
            gen_arg = jax.random.normal(
                act_key, (D, SUB, lanes), jnp.float32
            )
            gen_spec = pl.BlockSpec(
                (D, SUB, LB), lambda i: (0, 0, i), memory_space=pltpu.VMEM
            )

        kernel = functools.partial(
            _rollout_kernel,
            H=H,
            reward_name=reward_name,
            check_rollover=check_rollover,
            disturb_mode=disturb_mode,
            sample=gen + "_joint",
        )
        kw = {"vma": frozenset(vma)} if vma else {}
        costs2d, acts = pl.pallas_call(
            kernel,
            grid=(lanes // LB,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # x0
                pl.BlockSpec(memory_space=pltpu.SMEM),  # scal
                pl.BlockSpec(memory_space=pltpu.SMEM),  # ints
                pl.BlockSpec(memory_space=pltpu.SMEM),  # ptar
                pl.BlockSpec(memory_space=pltpu.SMEM),  # vtar
                pl.BlockSpec(memory_space=pltpu.SMEM),  # dist
                pl.BlockSpec(memory_space=pltpu.SMEM),  # mean
                pl.BlockSpec((D, D), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),  # factor
                gen_spec,
            ],
            out_specs=[
                pl.BlockSpec((SUB, LB), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H, dA, SUB, LB), lambda i: (0, 0, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((SUB, lanes), jnp.float32, **kw),
                jax.ShapeDtypeStruct((H, dA, SUB, lanes), jnp.float32, **kw),
            ],
            interpret=interpret,
        )(
            x0[:16], scal, ints, ptar, vtar, dist,
            a_mean.reshape(-1).astype(jnp.float32),
            factor.astype(jnp.float32),
            gen_arg,
        )
        return (
            costs2d.reshape(N_pad)[:N],
            acts.reshape(D, N_pad)[:, :N],
        )

    return rollout_sample


def make_pallas_rollout_batched(env: QuadEnv, interpret: bool = False,
                                fast_keys: bool = False):
    """Scenario-batched fused rollout: one kernel over a (B, lane-tiles)
    grid — the pod-configuration inner loop (B domain-randomized scenarios
    x N samples each). `jax.vmap` cannot batch the single-scenario kernel
    (SMEM blocks don't tile), so the scenario index is a native grid
    dimension with scenario-strided scalar tables.

    Returns ``rollout_costs_b(x0s (B,16), t0s (B,), pos_trajs (B,T,3),
    vel_trajs, actions (B,N,H,dA), params_b (leaves batched on axis 0),
    step_keys (B,...), deterministic, discount) -> costs (B, N)``.
    """
    reward_name = env.reward_name
    check_rollover = not env.config.disable_rollover_terminate
    disturb_mode = _disturb_mode(env)

    def rollout_costs_b(
        x0s, t0s, pos_trajs, vel_trajs, actions, params_b, step_keys,
        deterministic: bool = False, discount=1.0, vma=(), layout="bnhd",
    ):
        """``layout``: "bnhd" = actions (B, N, H, dA); "bhdn" = actions
        (B, H, dA, N) or (B, H*dA, N) already in kernel layout (what the
        transposed samplers emit) — skips the per-scenario transposes."""
        if layout == "bnhd":
            B, N, H, dA = actions.shape
        else:
            actions = actions.reshape(
                actions.shape[0], -1, 4, actions.shape[-1]
            )
            B, H, dA, N = actions.shape
        assert dA == 4, f"pallas batched rollout needs action_dim=4, got {dA}"
        # pad the sample axis to a whole tile (see make_pallas_rollout)
        N_pad, lanes, LB = _lane_blocks(N)
        if N_pad != N:
            pad_shape = (
                (B, N_pad - N, H, dA) if layout == "bnhd"
                else (B, H, dA, N_pad - N)
            )
            actions = jnp.concatenate(
                [actions, jnp.zeros(pad_shape, actions.dtype)],
                axis=1 if layout == "bnhd" else -1,
            )
        T = pos_trajs.shape[1]

        ptar, vtar, dist, scal, ints = jax.vmap(
            lambda x0, t0, pt, vt, p, k: _pack_kernel_inputs(
                env, x0, t0, pt, vt, p, k, deterministic, discount, H,
                fast_keys,
            )
        )(x0s, t0s, pos_trajs, vel_trajs, params_b, step_keys)

        if layout == "bnhd":
            acts = actions.transpose(0, 2, 3, 1).reshape(B, H, dA, SUB, lanes)
        else:
            acts = actions.reshape(B, H, dA, SUB, lanes)

        kernel = functools.partial(
            _rollout_kernel,
            H=H,
            reward_name=reward_name,
            check_rollover=check_rollover,
            disturb_mode=disturb_mode,
            batched=True,
        )
        costs = pl.pallas_call(
            kernel,
            grid=(B, lanes // LB),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # x0s flat
                pl.BlockSpec(memory_space=pltpu.SMEM),  # scal flat
                pl.BlockSpec(memory_space=pltpu.SMEM),  # ints flat
                pl.BlockSpec(memory_space=pltpu.SMEM),  # ptar flat
                pl.BlockSpec(memory_space=pltpu.SMEM),  # vtar flat
                pl.BlockSpec(memory_space=pltpu.SMEM),  # dist flat
                pl.BlockSpec(
                    (1, H, dA, SUB, LB),
                    lambda b, i: (b, 0, 0, 0, i),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, SUB, LB), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct(
                (B, SUB, lanes), jnp.float32,
                **({"vma": frozenset(vma)} if vma else {}),
            ),
            interpret=interpret,
        )(
            x0s[:, :16].reshape(-1),
            scal.reshape(-1),
            ints.reshape(-1),
            ptar.reshape(-1),
            vtar.reshape(-1),
            dist.reshape(-1),
            acts,
        )
        return costs.reshape(B, N_pad)[:, :N]

    return rollout_costs_b


def make_pallas_rollout_batched_sampling(
    env: QuadEnv, interpret: bool = False, joint: bool = False,
    fast_keys: bool = False,
):
    """Scenario-batched fused SAMPLE + rollout: the per-scenario MVN draw
    runs inside the (B, lane-tiles) grid kernel — the scenario-batched
    counterpart of :func:`make_pallas_rollout_sampling` (``joint=False``,
    per-step Cholesky, MPPI) and
    :func:`make_pallas_rollout_joint_sampling` (``joint=True``, full
    (H·dA)² factor, CoVO). Streams are disjoint per (scenario, lane
    block): hardware PRNG seeded with (key bits, b, block).

    Returns ``rollout_sample(x0s (B,16), t0s, pos_trajs, vel_trajs,
    a_means (B,H,dA), facs, params_b, step_keys (B,...), act_key, N,
    deterministic, discount, vma=()) -> (costs (B,N), a_t (B, H*dA, N))``
    where ``facs`` is (B,H,dA,dA) per-step Cholesky factors
    (``joint=False``) or (B,D,D) full factors (``joint=True``).
    """
    reward_name = env.reward_name
    check_rollover = not env.config.disable_rollover_terminate
    disturb_mode = _disturb_mode(env)
    gen = "input_z" if (interpret or jax.default_backend() != "tpu") else "prng"

    def rollout_sample(
        x0s, t0s, pos_trajs, vel_trajs, a_means, facs, params_b, step_keys,
        act_key, N: int, deterministic: bool = False, discount=1.0, vma=(),
    ):
        B, H, dA = a_means.shape
        assert dA == 4, f"pallas sampling rollout needs action_dim=4, got {dA}"
        D = H * dA
        N_pad, lanes, LB = _lane_blocks(N)

        ptar, vtar, dist, scal, ints = jax.vmap(
            lambda x0, t0, pt, vt, p, k: _pack_kernel_inputs(
                env, x0, t0, pt, vt, p, k, deterministic, discount, H,
                fast_keys,
            )
        )(x0s, t0s, pos_trajs, vel_trajs, params_b, step_keys)

        if gen == "prng":
            gen_arg = jax.lax.bitcast_convert_type(
                jax.random.key_data(act_key).reshape(-1)[-1:], jnp.int32
            )
            gen_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        elif joint:
            gen_arg = jax.random.normal(
                act_key, (B, D, SUB, lanes), jnp.float32
            )
            gen_spec = pl.BlockSpec(
                (1, D, SUB, LB), lambda b, i: (b, 0, 0, i),
                memory_space=pltpu.VMEM,
            )
        else:
            gen_arg = jax.random.normal(
                act_key, (B, H, dA, SUB, lanes), jnp.float32
            )
            gen_spec = pl.BlockSpec(
                (1, H, dA, SUB, LB), lambda b, i: (b, 0, 0, 0, i),
                memory_space=pltpu.VMEM,
            )
        if joint:
            fac_arg = facs.astype(jnp.float32)  # (B, D, D)
            fac_spec = pl.BlockSpec(
                (1, D, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
            )
        else:
            fac_arg = facs.reshape(-1).astype(jnp.float32)  # (B*H*16,)
            fac_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

        kernel = functools.partial(
            _rollout_kernel,
            H=H,
            reward_name=reward_name,
            check_rollover=check_rollover,
            disturb_mode=disturb_mode,
            batched=True,
            sample=gen + ("_joint" if joint else ""),
        )
        kw = {"vma": frozenset(vma)} if vma else {}
        costs, acts = pl.pallas_call(
            kernel,
            grid=(B, lanes // LB),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # x0s flat
                pl.BlockSpec(memory_space=pltpu.SMEM),  # scal flat
                pl.BlockSpec(memory_space=pltpu.SMEM),  # ints flat
                pl.BlockSpec(memory_space=pltpu.SMEM),  # ptar flat
                pl.BlockSpec(memory_space=pltpu.SMEM),  # vtar flat
                pl.BlockSpec(memory_space=pltpu.SMEM),  # dist flat
                pl.BlockSpec(memory_space=pltpu.SMEM),  # means flat
                fac_spec,
                gen_spec,
            ],
            out_specs=[
                pl.BlockSpec((1, SUB, LB), lambda b, i: (b, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, H, dA, SUB, LB),
                             lambda b, i: (b, 0, 0, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, SUB, lanes), jnp.float32, **kw),
                jax.ShapeDtypeStruct((B, H, dA, SUB, lanes), jnp.float32,
                                     **kw),
            ],
            interpret=interpret,
        )(
            x0s[:, :16].reshape(-1),
            scal.reshape(-1),
            ints.reshape(-1),
            ptar.reshape(-1),
            vtar.reshape(-1),
            dist.reshape(-1),
            a_means.reshape(-1).astype(jnp.float32),
            fac_arg,
            gen_arg,
        )
        return (
            costs.reshape(B, N_pad)[:, :N],
            acts.reshape(B, D, N_pad)[:, :, :N],
        )

    return rollout_sample


def _primal_kernel(
    x0_ref,  # (16,) f32 SMEM
    scal_ref,  # (10,) f32 SMEM (discount slot unused)
    a_ref,  # (H*4,) f32 SMEM — raw (unclipped) nominal actions
    dist_ref,  # (H*3,) f32 SMEM
    zs_ref,  # (H*13, 128) f32 VMEM out; pre-step state h at rows h*13..h*13+12
    *,
    H: int,
):
    m = scal_ref[_M]
    g = scal_ref[_G]
    dt = scal_ref[_DT]
    alpha = scal_ref[_ALPHA]
    ascale = scal_ref[_ASCALE]
    max_thrust = scal_ref[_MAX_THRUST]
    mo = (scal_ref[_MO0], scal_ref[_MO1], scal_ref[_MO2])

    def bc(s):
        return jnp.full((1, 128), s, dtype=jnp.float32)

    state = tuple(bc(x0_ref[i]) for i in range(13))
    for h in range(H):
        for c in range(13):
            zs_ref[h * 13 + c, :] = state[c][0]
        action = tuple(a_ref[4 * h + j] for j in range(4))
        fdist = tuple(dist_ref[3 * h + j] for j in range(3))
        state = _dyn_step(
            state, action, fdist, m, g, dt, alpha, ascale, max_thrust, mo
        )


def make_pallas_primal(env: QuadEnv, H: int, interpret: bool = False):
    """Single-trajectory nominal rollout collecting z_h = (s_h, a_h).

    The adjoint Hessian's primal pass (ops/hessian.py:make_hessian_adjoint
    step 1) is 32 SEQUENTIAL 13-dim dynamics steps; as an XLA scan each
    step is its own fusion launch and the chain costs ~0.8 ms — the
    whole rest of the Hessian hides inside it. In-kernel the chain is
    ~2k elementwise ops on one (1, 128) tile.

    Same state math as the N-sample kernel (shared _dyn_step); matches the
    lax.scan primal bit-for-bit up to fp reassociation (pinned in
    tests/test_covo.py).
    """

    def primal(x0, a_seq, dist, params, vma=()):
        # ``vma``: mesh axes the output varies over — required when the
        # kernel runs inside shard_map under check_vma (e.g. the design
        # stage of parallel/pipeline.py)
        scal = jnp.stack(
            [
                params.m, params.g, jnp.float32(env._dt), params.alpha_bodyrate,
                params.action_scale, params.max_thrust,
                params.max_omega[0], params.max_omega[1], params.max_omega[2],
                jnp.float32(1.0),
            ]
        ).astype(jnp.float32)
        zs = pl.pallas_call(
            functools.partial(_primal_kernel, H=H),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # x0
                pl.BlockSpec(memory_space=pltpu.SMEM),  # scal
                pl.BlockSpec(memory_space=pltpu.SMEM),  # actions
                pl.BlockSpec(memory_space=pltpu.SMEM),  # disturb table
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (H * 13, 128), jnp.float32,
                **({"vma": frozenset(vma)} if vma else {}),
            ),
            interpret=interpret,
        )(
            x0[:16].astype(jnp.float32),
            scal,
            a_seq.reshape(-1).astype(jnp.float32),
            dist.reshape(-1).astype(jnp.float32),
        )
        s = zs[:, 0].reshape(H, 13)
        return jnp.concatenate([s, a_seq], axis=1)  # (H, 17)

    return primal
