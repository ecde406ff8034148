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
parameter vector (hole position, mass, disk plane normal, and — on the
Kerr path — spin; disk inner/outer/horizon/relativity radii enter the
march only through masks — their smooth gradients flow through shading
instead, exactly like the jnp "diff" path).  All three integration paths
are mirrored: Euler, RK45 (with the controller's h-carry — rejected
lanes retry with the shrunken step, differentiated like the "diff" mode
scan does), and the Kerr Hamiltonian RK4 (whose dH/dx inner ``jax.vjp``
the backward rule differentiates again — second-order AD).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from bhx.kernels.march_pallas import (
    CROSS_FIELDS,
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


def _kerr_scalars_pure(rx, ry, rz, mass, a_k):
    """Mirror of march_pallas._kernel kerr_scalars (bhx.kerr semantics)."""
    a2_k = a_k * a_k
    rho2 = rx * rx + ry * ry + rz * rz
    b_ = rho2 - a2_k
    r2 = 0.5 * (b_ + jnp.sqrt(b_ * b_ + 4.0 * a2_k * rz * rz + 1e-20))
    r2 = jnp.maximum(r2, 1e-12)
    r = jnp.sqrt(r2)
    f = 2.0 * mass * r2 * r / (r2 * r2 + a2_k * rz * rz + 1e-20)
    denom = r2 + a2_k
    lx = (r * rx + a_k * ry) / denom
    ly = (r * ry - a_k * rx) / denom
    lz = rz / r
    return r, f, lx, ly, lz


def _kerr_rhs_pure(rx, ry, rz, qx, qy, qz, mass, a_k):
    """Mirror of the in-kernel kerr_rhs: dx = p - f lp l; dp = -dH/dx via
    jax.vjp (differentiable — the replay takes second-order derivatives
    through this under the backward rule)."""
    _, f, lx, ly, lz = _kerr_scalars_pure(rx, ry, rz, mass, a_k)
    lp = 1.0 + lx * qx + ly * qy + lz * qz
    flp = f * lp
    dxx = qx - flp * lx
    dxy = qy - flp * ly
    dxz = qz - flp * lz

    def h_of_x(ax, ay, az):
        _, f_, lx_, ly_, lz_ = _kerr_scalars_pure(ax, ay, az, mass, a_k)
        lp_ = 1.0 + lx_ * qx + ly_ * qy + lz_ * qz
        return -0.5 * f_ * lp_ * lp_

    _, vjp = jax.vjp(h_of_x, rx, ry, rz)
    gx, gy, gz = vjp(jnp.ones_like(rx))
    return dxx, dxy, dxz, -gx, -gy, -gz


def step_pure(s, sc, kcfg: MarchKernelConfig):
    """Pure-functional mirror of the kernel's substep
    (march_pallas._kernel substep) for ALL THREE integration paths —
    Euler / RK45 (pseudo-Newtonian force) and the Kerr Hamiltonian RK4 —
    crossing slots carried in the state.

    ``s``: dict of per-ray arrays — px py pz dx dy dz h act steps steps0
    closest2 count amount_ub horizon exited slots (slots: (K*7, N)
    field-major, matching the kernel's output rows; plus qx qy qz for
    geodesics="kerr").
    ``sc``: scalar dict.  Must stay operation-for-operation identical to
    the in-kernel substep so the replayed trajectory (and hence the
    adjoint) matches the forward (guarded by the parity tests).
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
    kerr = kcfg.geodesics == "kerr"

    px, py, pz = s["px"], s["py"], s["pz"]
    dx, dy, dz = s["dx"], s["dy"], s["dz"]
    act = s["act"] > 0.5

    rx, ry, rz = px - bx, py - by, pz - bz
    cxv = ry * dz - rz * dy
    cyv = rz * dx - rx * dz
    czv = rx * dy - ry * dx
    h2 = cxv * cxv + cyv * cyv + czv * czv

    def accel(qx_, qy_, qz_):
        arx, ary, arz = qx_ - bx, qy_ - by, qz_ - bz
        r2_ = arx * arx + ary * ary + arz * arz
        ir_ = jax.lax.rsqrt(r2_ + 1e-12)
        ir2_ = ir_ * ir_
        inv_r5_ = ir2_ * ir2_ * ir_
        a_s_ = (-3.0) * mass * h2 * inv_r5_
        return a_s_ * arx, a_s_ * ary, a_s_ * arz

    def norm3(x, y, z):
        inv = jax.lax.rsqrt(x * x + y * y + z * z + 1e-20)
        return x * inv, y * inv, z * inv

    q_out = {}
    kerr_captured = None
    if kerr:
        # --- Kerr Hamiltonian RK4 mirror (march_pallas kerr branch) ---
        a_k = sc["spin"] * mass
        spin = sc["spin"]
        r_plus = mass * (1.0 + jnp.sqrt(jnp.clip(1.0 - spin * spin, 0.0, 1.0)))
        inv_3m = 1.0 / (3.0 * mass)
        qx, qy, qz = s["qx"], s["qy"], s["qz"]
        r0, _, _, _, _ = _kerr_scalars_pure(rx, ry, rz, mass, a_k)
        t_ = r0 * inv_3m
        hk = jnp.clip(sc["step_size"] * t_ * jnp.sqrt(t_), 2e-3, 1.0)

        def rhs(arx, ary, arz, aqx, aqy, aqz):
            return _kerr_rhs_pure(arx, ary, arz, aqx, aqy, aqz, mass, a_k)

        k1 = rhs(rx, ry, rz, qx, qy, qz)
        k2 = rhs(
            rx + 0.5 * hk * k1[0], ry + 0.5 * hk * k1[1],
            rz + 0.5 * hk * k1[2],
            qx + 0.5 * hk * k1[3], qy + 0.5 * hk * k1[4],
            qz + 0.5 * hk * k1[5],
        )
        k3 = rhs(
            rx + 0.5 * hk * k2[0], ry + 0.5 * hk * k2[1],
            rz + 0.5 * hk * k2[2],
            qx + 0.5 * hk * k2[3], qy + 0.5 * hk * k2[4],
            qz + 0.5 * hk * k2[5],
        )
        k4 = rhs(
            rx + hk * k3[0], ry + hk * k3[1], rz + hk * k3[2],
            qx + hk * k3[3], qy + hk * k3[4], qz + hk * k3[5],
        )
        sixth = hk * (1.0 / 6.0)
        nrx = rx + sixth * (k1[0] + 2 * k2[0] + 2 * k3[0] + k4[0])
        nry = ry + sixth * (k1[1] + 2 * k2[1] + 2 * k3[1] + k4[1])
        nrz = rz + sixth * (k1[2] + 2 * k2[2] + 2 * k3[2] + k4[2])
        nqx = qx + sixth * (k1[3] + 2 * k2[3] + 2 * k3[3] + k4[3])
        nqy = qy + sixth * (k1[4] + 2 * k2[4] + 2 * k3[4] + k4[4])
        nqz = qz + sixth * (k1[5] + 2 * k2[5] + 2 * k3[5] + k4[5])
        sgx, sgy, sgz = nrx - rx, nry - ry, nrz - rz
        seg_len = jnp.sqrt(sgx * sgx + sgy * sgy + sgz * sgz + 1e-24)
        inv_seg = 1.0 / seg_len
        ndx, ndy, ndz = sgx * inv_seg, sgy * inv_seg, sgz * inv_seg
        npx, npy, npz = nrx + bx, nry + by, nrz + bz
        h_used = seg_len
        h_next = s["h"]
        applied = act
        r_new, _, _, _, _ = _kerr_scalars_pure(nrx, nry, nrz, mass, a_k)
        kerr_captured = applied & (r_new <= r_plus)
        app3 = jnp.where(applied, 1.0, 0.0)
        q_out = dict(
            qx=app3 * nqx + (1.0 - app3) * qx,
            qy=app3 * nqy + (1.0 - app3) * qy,
            qz=app3 * nqz + (1.0 - app3) * qz,
        )
    elif kcfg.integrator == "euler":
        h_used = s["h"]
        ax, ay, az = accel(px, py, pz)
        ndx, ndy, ndz = norm3(
            dx + ax * h_used, dy + ay * h_used, dz + az * h_used
        )
        npx = px + ndx * h_used
        npy = py + ndy * h_used
        npz = pz + ndz * h_used
        applied = act
        h_next = h_used
    else:
        # --- RK45 Cash-Karp mirror with the h-carry (march_pallas rk45
        # branch): rejected lanes retry with the shrunken h next pass ---
        from bhx.integrate import (
            A21, A31, A32, A41, A42, A43, A51, A52, A53, A54,
            A61, A62, A63, A64, A65, B1, B3, B4, B6, E1, E3, E4, E5, E6,
        )

        h_used = s["h"]

        def stage(cx_, cy_, cz_):
            return accel(px + cx_ * h_used, py + cy_ * h_used, pz + cz_ * h_used)

        k1 = accel(px, py, pz)
        k2 = stage(A21 * k1[0], A21 * k1[1], A21 * k1[2])
        k3 = stage(A31 * k1[0] + A32 * k2[0], A31 * k1[1] + A32 * k2[1],
                   A31 * k1[2] + A32 * k2[2])
        k4 = stage(A41 * k1[0] + A42 * k2[0] + A43 * k3[0],
                   A41 * k1[1] + A42 * k2[1] + A43 * k3[1],
                   A41 * k1[2] + A42 * k2[2] + A43 * k3[2])
        k5 = stage(A51 * k1[0] + A52 * k2[0] + A53 * k3[0] + A54 * k4[0],
                   A51 * k1[1] + A52 * k2[1] + A53 * k3[1] + A54 * k4[1],
                   A51 * k1[2] + A52 * k2[2] + A53 * k3[2] + A54 * k4[2])
        k6 = stage(
            A61 * k1[0] + A62 * k2[0] + A63 * k3[0] + A64 * k4[0] + A65 * k5[0],
            A61 * k1[1] + A62 * k2[1] + A63 * k3[1] + A64 * k4[1] + A65 * k5[1],
            A61 * k1[2] + A62 * k2[2] + A63 * k3[2] + A64 * k4[2] + A65 * k5[2],
        )
        ix = B1 * k1[0] + B3 * k3[0] + B4 * k4[0] + B6 * k6[0]
        iy = B1 * k1[1] + B3 * k3[1] + B4 * k4[1] + B6 * k6[1]
        iz = B1 * k1[2] + B3 * k3[2] + B4 * k4[2] + B6 * k6[2]
        ex = h_used * (E1 * k1[0] + E3 * k3[0] + E4 * k4[0] + E5 * k5[0] + E6 * k6[0])
        ey = h_used * (E1 * k1[1] + E3 * k3[1] + E4 * k4[1] + E5 * k5[1] + E6 * k6[1])
        ez = h_used * (E1 * k1[2] + E3 * k3[2] + E4 * k4[2] + E5 * k5[2] + E6 * k6[2])
        err = jnp.maximum(jnp.abs(ex), jnp.maximum(jnp.abs(ey), jnp.abs(ez)))
        ratio = err / sc["rtol"]
        accept = ratio <= 1.0
        r4 = jax.lax.rsqrt(jax.lax.rsqrt(ratio + 1e-12))
        grow = jnp.clip(sc["safety"] * r4, 1.0, sc["max_f"])
        shrink = jnp.clip(sc["safety"] * r4, sc["min_f"], 1.0)
        h_next = jnp.clip(h_used * jnp.where(accept, grow, shrink),
                          sc["h_min"], sc["h_max"])
        ndx, ndy, ndz = norm3(dx + h_used * ix, dy + h_used * iy, dz + h_used * iz)
        npx = px + dx * h_used
        npy = py + dy * h_used
        npz = pz + dz * h_used
        applied = act & accept

    # --- segment hit tests (masks only; no gradient paths) ---
    if kerr:
        hit_h = kerr_captured
        t_h = jnp.where(kerr_captured, 0.0, 1e9)
    else:
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
        h=jnp.where(act, h_next, s["h"]), act=act_out, steps=steps,
        steps0=s["steps0"],
        closest2=closest2, count=count, amount_ub=amount_ub,
        horizon=horizon, exited=exited, slots=slots,
        **q_out,
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
    """Step-exact jnp mirror of :func:`march_pallas` — all three
    integration paths (Euler / RK45 pseudo-Newtonian, Kerr Hamiltonian).

    Same tuple-of-rows I/O contract: kcfg.in_fields (N,) rows in,
    kcfg.out_fields (N,) rows out.  Differentiable; used as the recompute
    target of the backward rule and as an interpret-free parity oracle in
    tests.
    """
    kerr = kcfg.geodesics == "kerr"
    assert len(rays) == kcfg.in_fields
    sc = {
        k: params[_P[k]]
        for k in (
            "bh_x", "bh_y", "bh_z", "mass", "horizon_r", "rel_r",
            "disk_nx", "disk_ny", "disk_nz", "disk_inner", "disk_outer",
            "cutoff", "budget", "step_size", "spin",
            "rtol", "safety", "min_f", "max_f", "h_min", "h_max",
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
    if kerr:
        state.update(qx=rays[10], qy=rays[11], qz=rays[12])
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
    out = tuple(rows) + tuple(
        slots[i] for i in range(K * CROSS_FIELDS)
    )
    if kerr:
        out = out + (final["qx"], final["qy"], final["qz"])
    return out


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
    C = kcfg.bwd_chunks
    n = rays[0].shape[0]
    if C <= 1 or n % C != 0:
        _, vjp = jax.vjp(lambda r, p: march_jnp(r, p, kcfg), rays, params)
        return vjp(g)
    # Ray-chunked adjoint: rays are independent through the march, so the
    # replay splits along the ray axis with zero error; chunks run
    # sequentially (lax.map), dividing peak backward memory by C at the
    # cost of C sequential sweeps.  Parameter cotangents sum over chunks.
    m = n // C
    rays_c = tuple(r.reshape(C, m) for r in rays)
    g_c = tuple(x.reshape(C, m) for x in g)

    def chunk(args):
        rc, gc = args
        _, vjp = jax.vjp(lambda r, p: march_jnp(r, p, kcfg), rc, params)
        return vjp(gc)

    dr_c, dp_c = jax.lax.map(chunk, (rays_c, g_c))
    return tuple(x.reshape(n) for x in dr_c), jnp.sum(dp_c, axis=0)


march_pallas_diff.defvjp(_march_fwd, _march_bwd)
