"""Reverse-differentiable Pallas geodesic march (recompute adjoint).

``march_pallas_diff`` wraps the forward march kernel
(:mod:`bhx.kernels.march_pallas`) in :func:`jax.custom_vjp` so that
``march_mode="pallas"`` renders are reverse-differentiable *on the kernel
path* — primal evaluation runs the unmodified fast kernel, and only under
differentiation does the backward sweep run, as a binary-rematerialized
jnp replay of the identical step math.  (The reference has no gradients
at all; the hot loop whose adjoint this provides lives at
ray.wgsl:482-596.)

Design (same recompute-adjoint pattern as
:mod:`bhx.kernels.shade_pallas`, extended along the time axis):

* **Primal-only calls pay nothing.**  ``custom_vjp``'s fwd rule returns
  the kernel output and stashes only the *inputs* — no checkpoints are
  written, no extra kernel variant exists, the forward stays at full
  throughput whether or not it sits under ``jax.grad``.
* **Backward = replay + VJP of a step-exact jnp mirror.**  The bwd rule
  calls ``jax.vjp`` on :func:`march_jnp`, a pure-jnp march whose substep
  (:func:`step_pure`) mirrors the kernel's Euler substep
  (march_pallas._kernel) operation-for-operation, then pulls the output
  cotangent back through it.  Memory is bounded by binary-recursive
  :func:`jax.checkpoint` over the step count: peak live state is
  O(log2(T) + leaf) ray-state copies instead of O(T).
* **Step-count parity.**  The kernel executes substeps in blocks of
  ``B = (vote_every // unroll) * unroll`` between all-lanes-done votes,
  so a tile with any live lane runs ``ceil(max_iterations / B) * B``
  substeps; per-lane activity masks (budget / exit / absorb) make the
  overrun steps identities.  The mirror runs exactly that many masked
  substeps, so trajectories agree to float associativity.
* **Masks don't differentiate.**  Termination, crossing and budget
  decisions are boolean comparisons, and the kernel's heuristic
  transmission bound is wrapped in ``stop_gradient`` — the adjoint is
  exact for the piecewise-smooth map away from decision boundaries,
  matching the ``march_mode="diff"`` semantics (tested in
  tests/test_march_grad.py).

Gradients produced: w.r.t. the input rays (origin, direction, h,
incoming transmission — hence camera pose and fov) and the scalar
parameter vector (hole position, mass, disk plane normal; disk
inner/outer/horizon/relativity radii enter the march only through masks —
their smooth gradients flow through shading instead, exactly like the
jnp "diff" path).  Euler only: the RK45 controller's rejection-retry
chain has data-dependent step sizes whose replay adds little value
(training runs use fixed-step Euler; RK45 gradients remain available via
``march_mode="diff"``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from bhx.kernels.march_pallas import (
    CROSS_FIELDS,
    IN_FIELDS,
    OUT_FIXED,
    MarchKernelConfig,
    _OUT_FIXED,
    _P,
    march_pallas,
)

# Substeps per rematerialization leaf (one inline scan's worth of
# stored residuals during the backward pass).
_LEAF = 32
# Leaves per rematerialized segment: the time axis is decomposed as
# scan(n_seg) ∘ remat ∘ scan(_SEG_LEAVES) ∘ remat ∘ scan(_LEAF) so the
# step body is traced ONCE per level (fast compile) while backward peak
# memory stays O(n_seg + _SEG_LEAVES + _LEAF) ray states.
_SEG_LEAVES = 7


def _block_steps(kcfg: MarchKernelConfig) -> int:
    """Substeps the kernel executes between all-lanes-done votes."""
    inner = max(1, kcfg.vote_every // kcfg.unroll)
    return inner * kcfg.unroll


def total_steps(kcfg: MarchKernelConfig) -> int:
    """Exact substep count a tile with a live lane executes."""
    b = _block_steps(kcfg)
    return -(-kcfg.max_iterations // b) * b


def step_pure(s, sc, kcfg: MarchKernelConfig):
    """Pure-functional mirror of the kernel's Euler substep
    (march_pallas._kernel substep), crossing slots carried in the state.

    ``s``: dict of per-ray arrays — px py pz dx dy dz h act steps steps0
    closest2 count amount_ub horizon exited slots (slots: (K*7, N)
    field-major, matching the kernel's output rows).
    ``sc``: scalar dict.  Must stay operation-for-operation identical to
    the in-kernel substep so the replayed trajectory (and hence the
    adjoint) matches the forward (guarded by the parity test).
    """
    bx, by, bz = sc["bh_x"], sc["bh_y"], sc["bh_z"]
    mass = sc["mass"]
    horizon_r2 = sc["horizon_r"] * sc["horizon_r"]
    rel_r2 = sc["rel_r"] * sc["rel_r"]
    nx, ny, nz = sc["disk_nx"], sc["disk_ny"], sc["disk_nz"]
    d_in, d_out = sc["disk_inner"], sc["disk_outer"]
    d_in2, d_out2 = d_in * d_in, d_out * d_out
    inv_d_out = 1.0 / d_out
    K = kcfg.max_crossings

    px, py, pz = s["px"], s["py"], s["pz"]
    dx, dy, dz = s["dx"], s["dy"], s["dz"]
    act = s["act"] > 0.5
    h_used = s["h"]

    rx, ry, rz = px - bx, py - by, pz - bz
    cxv = ry * dz - rz * dy
    cyv = rz * dx - rx * dz
    czv = rx * dy - ry * dx
    h2 = cxv * cxv + cyv * cyv + czv * czv

    r2 = rx * rx + ry * ry + rz * rz
    ir = jax.lax.rsqrt(r2 + 1e-12)
    ir2 = ir * ir
    inv_r5 = ir2 * ir2 * ir
    a_s = (-3.0) * mass * h2 * inv_r5
    ax, ay, az = a_s * rx, a_s * ry, a_s * rz
    vx, vy, vz = dx + ax * h_used, dy + ay * h_used, dz + az * h_used
    inv_n = jax.lax.rsqrt(vx * vx + vy * vy + vz * vz + 1e-20)
    ndx, ndy, ndz = vx * inv_n, vy * inv_n, vz * inv_n
    npx = px + ndx * h_used
    npy = py + ndy * h_used
    npz = pz + ndz * h_used
    applied = act

    # --- segment hit tests (masks only; no gradient paths) ---
    half_b = rx * ndx + ry * ndy + rz * ndz
    c_q = rx * rx + ry * ry + rz * rz - horizon_r2
    disc4 = half_b * half_b - c_q
    sq = jnp.sqrt(jnp.maximum(disc4, 0.0))
    t1 = -half_b - sq
    t2 = -half_b + sq
    v1 = (disc4 > 0.0) & (t1 > 1e-8) & (t1 < h_used)
    v2 = (disc4 > 0.0) & (t2 > 1e-8) & (t2 < h_used)
    t_h = jnp.where(v1, t1, jnp.where(v2, t2, 1e9))
    hit_h = v1 | v2

    if kcfg.show_disk:
        denom = nx * ndx + ny * ndy + nz * ndz
        denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
        t_d = ((bx - px) * nx + (by - py) * ny + (bz - pz) * nz) / denom
        hx = px + ndx * t_d
        hy = py + ndy * t_d
        hz = pz + ndz * t_d
        rr2 = (hx - bx) ** 2 + (hy - by) ** 2 + (hz - bz) ** 2
        hit_d = (
            (t_d > 1e-8) & (t_d < h_used) & (rr2 >= d_in2) & (rr2 <= d_out2)
        )
    else:
        hit_d = jnp.zeros_like(hit_h)
        t_d = jnp.full_like(t_h, 1e9)
        hx = hy = hz = jnp.zeros_like(px)
        rr2 = jnp.zeros_like(px)

    horizon_first = hit_h & (t_h <= t_d)
    crossing = applied & hit_d & jnp.logical_not(horizon_first)
    hit_horizon = applied & horizon_first

    count = s["count"]
    amount_ub = s["amount_ub"]
    slots = s["slots"]
    if kcfg.show_disk:
        # Early-exit transmission bound — a heuristic mask input in the
        # kernel, so keep the whole block out of the autodiff graph.
        rr2_ng = jax.lax.stop_gradient(rr2)
        irr = jax.lax.rsqrt(rr2_ng + 1e-20)
        rr = rr2_ng * irr
        inv_sqrt_rr = jnp.sqrt(irr)
        dens = 1.0 - rr * jax.lax.stop_gradient(inv_d_out)
        tt = jnp.clip(rr - jax.lax.stop_gradient(d_in), 0.0, 1.0)
        dens = dens * (tt * tt * (3.0 - 2.0 * tt))
        dens = jnp.maximum(dens * inv_sqrt_rr, 0.0)
        x = 30.0 * dens
        od_lb = jnp.where(x < 1.0, x * x, x)
        op_lb = jnp.clip(od_lb * 0.2, 0.0, 1.0) * kcfg.tex_opacity_min

        new_rows = []
        hit_vals = (hx, hy, hz, ndx, ndy, ndz)
        for k in range(K):
            put = crossing & (count == float(k))
            base = k * CROSS_FIELDS
            for f in range(6):
                new_rows.append(
                    jnp.where(put, hit_vals[f], slots[base + f])
                )
            new_rows.append(jnp.where(put, 1.0, slots[base + 6]))
        slots = jnp.stack(new_rows, axis=0)
        count = count + jnp.where(crossing, 1.0, 0.0)
        amount_ub = amount_ub * jnp.where(crossing, 1.0 - op_lb, 1.0)

    applied_f = jnp.where(applied, 1.0, 0.0)
    napplied_f = 1.0 - applied_f
    out_px = applied_f * npx + napplied_f * px
    out_py = applied_f * npy + napplied_f * py
    out_pz = applied_f * npz + napplied_f * pz
    out_dx = applied_f * ndx + napplied_f * dx
    out_dy = applied_f * ndy + napplied_f * dy
    out_dz = applied_f * ndz + napplied_f * dz

    dist2 = (out_px - bx) ** 2 + (out_py - by) ** 2 + (out_pz - bz) ** 2
    closest2 = jnp.where(
        applied, jnp.minimum(s["closest2"], dist2), s["closest2"]
    )

    exited_now = applied & (dist2 > rel_r2)
    absorbed = hit_horizon | (act & (amount_ub < sc["cutoff"]))
    horizon = jnp.where(hit_horizon, 1.0, s["horizon"])
    exited = jnp.where(exited_now, 1.0, s["exited"])
    steps = s["steps"] + jnp.where(act, 1.0, 0.0)
    act_out = jnp.where(
        act & (s["steps0"] + steps < sc["budget"])
        & jnp.logical_not(exited_now | absorbed),
        1.0,
        0.0,
    )

    return dict(
        px=out_px, py=out_py, pz=out_pz,
        dx=out_dx, dy=out_dy, dz=out_dz,
        h=s["h"], act=act_out, steps=steps, steps0=s["steps0"],
        closest2=closest2, count=count, amount_ub=amount_ub,
        horizon=horizon, exited=exited, slots=slots,
    )


def _leaf(state, sc, kcfg: MarchKernelConfig, n: int):
    def body(s, _):
        return step_pure(s, sc, kcfg), None

    state, _ = jax.lax.scan(body, state, None, length=n)
    return state


def _run_steps(state, sc, kcfg: MarchKernelConfig, t: int):
    """Run exactly ``t`` substeps, rematerialized along the time axis.

    Structure: an outer scan over t // (_SEG_LEAVES * _LEAF) segments whose
    body is a checkpointed scan over _SEG_LEAVES checkpointed _LEAF-step
    leaves, plus a remainder chain.  Backward peak memory is
    O(n_seg + _SEG_LEAVES + _LEAF) ray-state copies instead of O(t), and
    the step body is traced once per nesting level instead of once per
    leaf (compile time)."""
    big = _SEG_LEAVES * _LEAF

    @jax.checkpoint
    def leaf_ck(s, scc):
        return _leaf(s, scc, kcfg, _LEAF)

    n_big = t // big
    if n_big:
        @jax.checkpoint
        def seg(s, scc):
            def inner(ss, _):
                return leaf_ck(ss, scc), None

            ss, _ = jax.lax.scan(inner, s, None, length=_SEG_LEAVES)
            return ss

        def outer(s, _):
            return seg(s, sc), None

        state, _ = jax.lax.scan(outer, state, None, length=n_big)

    rem = t - n_big * big
    n_leaf = rem // _LEAF
    if n_leaf:
        def inner2(s, _):
            return leaf_ck(s, sc), None

        state, _ = jax.lax.scan(inner2, state, None, length=n_leaf)
    tail = rem - n_leaf * _LEAF
    if tail:
        state = _leaf(state, sc, kcfg, tail)
    return state


def march_jnp(rays, params, kcfg: MarchKernelConfig):
    """Step-exact jnp mirror of :func:`march_pallas` (Euler only).

    Same tuple-of-rows I/O contract: IN_FIELDS (N,) rows in,
    OUT_FIXED + 7K (N,) rows out.  Differentiable; used as the recompute
    target of the backward rule and as an interpret-free parity oracle in
    tests.
    """
    assert kcfg.integrator == "euler", "jnp mirror supports Euler only"
    assert len(rays) == IN_FIELDS
    sc = {
        k: params[_P[k]]
        for k in (
            "bh_x", "bh_y", "bh_z", "mass", "horizon_r", "rel_r",
            "disk_nx", "disk_ny", "disk_nz", "disk_inner", "disk_outer",
            "cutoff", "budget",
        )
    }
    px0, py0, pz0 = rays[0], rays[1], rays[2]
    dx0, dy0, dz0 = rays[3], rays[4], rays[5]
    h0, act0, amount0, steps0 = rays[6], rays[7], rays[8], rays[9]
    n = rays[0].shape[0]
    K = kcfg.max_crossings
    zeros = jnp.zeros_like(px0)

    state = dict(
        px=px0, py=py0, pz=pz0, dx=dx0, dy=dy0, dz=dz0,
        h=h0,
        act=jnp.where(steps0 < sc["budget"], act0, 0.0),
        steps=zeros, steps0=steps0,
        closest2=(px0 - sc["bh_x"]) ** 2 + (py0 - sc["bh_y"]) ** 2
        + (pz0 - sc["bh_z"]) ** 2,
        count=zeros, amount_ub=amount0,
        horizon=zeros, exited=zeros,
        slots=jnp.zeros((K * CROSS_FIELDS, n), jnp.float32),
    )
    final = _run_steps(state, sc, kcfg, total_steps(kcfg))

    rows = [None] * OUT_FIXED
    rows[_OUT_FIXED["px"]] = final["px"]
    rows[_OUT_FIXED["py"]] = final["py"]
    rows[_OUT_FIXED["pz"]] = final["pz"]
    rows[_OUT_FIXED["dx"]] = final["dx"]
    rows[_OUT_FIXED["dy"]] = final["dy"]
    rows[_OUT_FIXED["dz"]] = final["dz"]
    rows[_OUT_FIXED["steps"]] = final["steps"]
    rows[_OUT_FIXED["closest"]] = jnp.sqrt(final["closest2"])
    rows[_OUT_FIXED["horizon"]] = final["horizon"]
    rows[_OUT_FIXED["exited"]] = final["exited"]
    rows[_OUT_FIXED["h"]] = final["h"]
    rows[_OUT_FIXED["amount"]] = final["amount_ub"]
    rows[_OUT_FIXED["count"]] = final["count"]
    slots = final["slots"]
    return tuple(rows) + tuple(
        slots[i] for i in range(K * CROSS_FIELDS)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def march_pallas_diff(rays, params, kcfg: MarchKernelConfig):
    """:func:`march_pallas` with a recompute-adjoint backward rule.

    Primal forward is the unmodified kernel; the backward replays the
    march through :func:`march_jnp` under binary rematerialization and
    pulls the cotangent back with ``jax.vjp``.
    """
    return march_pallas(rays, params, kcfg)


def _march_fwd(rays, params, kcfg):
    return march_pallas(rays, params, kcfg), (rays, params)


def _march_bwd(kcfg, res, g):
    rays, params = res
    _, vjp = jax.vjp(lambda r, p: march_jnp(r, p, kcfg), rays, params)
    return vjp(g)


march_pallas_diff.defvjp(_march_fwd, _march_bwd)
