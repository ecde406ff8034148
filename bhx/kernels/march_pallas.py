"""Pallas TPU kernel for the geodesic march (the hot loop).

Replaces the jnp march of bhx.tracer._march_phase for the forward path.
The reference's per-pixel megakernel interleaves integration, hit tests,
texture sampling and compositing in one divergent loop (ray.wgsl:518-581);
that shape is poison for a vector machine, so the kernel here is designed
around what the VPU does well:

* **SoA lane layout.** A grid step processes a tile of 1024 rays as
  (8, 128) registers per field — pure elementwise math, no gathers, no
  per-lane control flow.
* **Record, don't shade.** Texture lookups are gathers, so the kernel
  never touches textures: it *records* the geometry of up to K disk
  crossings per ray (position + direction per crossing) straight into the
  output ref, under a `pl.when(any(crossing))` guard so crossing-free
  steps (the vast majority) skip the bookkeeping entirely.  Shading
  (disk texture, Doppler/gravitational tint) and alpha compositing run
  afterwards as dense vectorized jnp over the recorded slots — exactly
  equivalent because shading depends only on crossing geometry.
* **Masked lane adaptivity.** RK45 step rejection/acceptance is a lane
  mask (rejected lanes retry with the shrunken h on the next loop pass);
  termination is a lane mask + an all-lanes-done vote in the while_loop
  condition, so a tile exits as soon as *its* rays are done — the TPU
  analogue of SIMT early exit at 1024-ray granularity (SURVEY.md §7
  hard part 1).
* **Transcendental-free steps.** r^-5 is rsqrt^5 (no pow), radial window
  tests compare squared distances, and the early-exit opacity bound uses
  the pow-free minorant x^1.3 >= min(x, x^2) instead of (30*dens)^1.3
  (ray.wgsl:623), so a step is pure mul/add/select + two rsqrt.
* **Unrolled loop.** UNROLL integration steps per while iteration
  amortize the scalar-unit cond/branch overhead of the loop.

The kernel runs in float32 (geodesics near the horizon need the mantissa;
r^-5 in bf16 is hopeless).  Layouts are FIELD-MAJOR end-to-end: rays
(F_in, N) in / (F_out, N) out, viewed as (F, tiles, s8, 128) with the grid
walking the tile axis through the BlockSpec index map — no relayout on
either side (an (N, F) layout costs lane-granularity transposes,
~20 ms/frame at 1080p; scripts/bisect_shade.py).  Scalar parameters ride
in SMEM.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bhx.integrate import (
    A21, A31, A32, A41, A42, A43, A51, A52, A53, A54, A61, A62, A63, A64, A65,
    B1, B3, B4, B6, E1, E3, E4, E5, E6,
)

LANES = 8 * 128  # rays per grid step

# Input ray fields.  Kerr marches carry 3 extra momentum fields (10-12).
IN_FIELDS = 10  # px, py, pz, dx, dy, dz, h, active, amount, steps_done

# Scalar parameter vector layout (SMEM).
_P = dict(
    bh_x=0, bh_y=1, bh_z=2, mass=3, horizon_r=4, rel_r=5,
    disk_nx=6, disk_ny=7, disk_nz=8, disk_inner=9, disk_outer=10,
    step_size=11, cutoff=12, rtol=13, safety=14, min_f=15, max_f=16,
    h_min=17, h_max=18,
    # Per-ray total step budget (float): a lane deactivates exactly when
    # steps_done + steps_this_call reaches it, so multi-round marching
    # matches the single-call budget semantics bit-for-bit.
    budget=19,
    # Dimensionless spin (geodesics="kerr" only; a = spin * mass).
    spin=20,
)
NUM_PARAMS = len(_P)

# Output field layout.  ``count`` is the TRUE number of disk crossings the
# ray made (not capped at max_crossings) — callers use it to measure how
# many crossings the K-slot record dropped (tests bound that fraction).
_OUT_FIXED = dict(
    px=0, py=1, pz=2, dx=3, dy=4, dz=5,
    steps=6, closest=7, horizon=8, exited=9, h=10, amount=11, count=12,
)
OUT_FIXED = len(_OUT_FIXED)
CROSS_FIELDS = 7  # hx, hy, hz, dx, dy, dz, valid

# Substeps fully unrolled per inner-loop iteration.
UNROLL = 4
# Steps between all-lanes-done votes: the while cond's vector reduce +
# scalar branch costs ~µs of pipeline stall, so vote rarely.  The final
# round may overrun a budget-capped ray by < VOTE_EVERY steps (such rays
# are photon-sphere orbiters that output their current direction; the
# overrun only changes that direction marginally).
VOTE_EVERY = 32


@dataclasses.dataclass(frozen=True)
class MarchKernelConfig:
    integrator: str = "euler"  # "euler" | "rk45"
    # "pseudo": the reference's pseudo-Newtonian bending force
    # (ray.wgsl:401-403).  "kerr": exact Kerr null geodesics — Hamiltonian
    # RK4 in Kerr-Schild coordinates with dH/dx from jax.vjp *inside* the
    # kernel body (pure elementwise math -> VPU code); mirrors bhx.kerr.
    geodesics: str = "pseudo"
    max_iterations: int = 2000
    max_crossings: int = 4
    # Disk-texture opacity factor lower bound (1.0 when texture disabled).
    tex_opacity_min: float = 0.7
    show_disk: bool = True
    vote_every: int = VOTE_EVERY
    # Sublane rows per tile: a tile is (sublanes, 128) lanes per field, so
    # each vector op covers sublanes/8 VPU registers — bigger tiles give
    # Mosaic independent chains to pipeline, at coarser early-exit
    # granularity (compaction rounds absorb that).
    sublanes: int = 8
    # Integration substeps unrolled per inner-loop iteration.
    unroll: int = UNROLL
    # Backward-pass ray chunking (march_grad custom_vjp): the adjoint
    # replays the jnp mirror over all rays; peak backward memory is
    # O(rays * state / bwd_chunks) because chunks run sequentially via
    # lax.map.  1 = single-shot (fastest when it fits).
    bwd_chunks: int = 1
    interpret: bool = False

    @property
    def lanes(self) -> int:
        return self.sublanes * 128

    @property
    def in_fields(self) -> int:
        return IN_FIELDS + (3 if self.geodesics == "kerr" else 0)

    @property
    def out_fields(self) -> int:
        # Kerr appends the final conjugate momentum after the slot block
        # (multi-round marching resumes from it).
        return (
            OUT_FIXED
            + CROSS_FIELDS * self.max_crossings
            + (3 if self.geodesics == "kerr" else 0)
        )


class _Rows:
    """Field-indexing adapter over a tuple of per-field block refs:
    ``rows[f, 0]`` reads / ``rows[f, 0] = v`` writes field f's (s8, 128)
    block, so the kernel body reads like the single-array layout."""

    def __init__(self, refs):
        self._refs = refs

    def __getitem__(self, idx):
        f = idx[0] if isinstance(idx, tuple) else idx
        return self._refs[f][0]

    def __setitem__(self, idx, value):
        f = idx[0] if isinstance(idx, tuple) else idx
        self._refs[f][0] = value


def _kernel(params_ref, *refs, kcfg: MarchKernelConfig):
    # refs = in_fields input refs followed by out_fields output refs; each
    # is a (1, s8, 128) block of its own contiguous (tiles, s8, 128) field
    # array (tuple-of-rows I/O — see march_pallas).
    rays_ref = _Rows(refs[:kcfg.in_fields])
    out_ref = _Rows(refs[kcfg.in_fields:])
    p = lambda name: params_ref[0, _P[name]]

    bx, by, bz = p("bh_x"), p("bh_y"), p("bh_z")
    mass = p("mass")
    horizon_r2 = p("horizon_r") * p("horizon_r")
    rel_r2 = p("rel_r") * p("rel_r")
    nx, ny, nz = p("disk_nx"), p("disk_ny"), p("disk_nz")
    d_in, d_out = p("disk_inner"), p("disk_outer")
    d_in2 = d_in * d_in
    d_out2 = d_out * d_out
    inv_d_out = 1.0 / d_out
    cutoff = p("cutoff")

    px0 = rays_ref[0, 0]
    py0 = rays_ref[1, 0]
    pz0 = rays_ref[2, 0]
    dx0 = rays_ref[3, 0]
    dy0 = rays_ref[4, 0]
    dz0 = rays_ref[5, 0]
    h0 = rays_ref[6, 0]
    act0 = rays_ref[7, 0]
    amount0 = rays_ref[8, 0]
    steps0 = rays_ref[9, 0]
    budget = p("budget")

    zeros = jnp.zeros_like(px0)
    K = kcfg.max_crossings
    kerr = kcfg.geodesics == "kerr"

    if kerr:
        # --- exact Kerr null geodesics (mirrors bhx.kerr; reference has
        # no spin at all — its force is ray.wgsl:401-403) ---
        spin = p("spin")
        a_k = spin * mass
        a2_k = a_k * a_k
        r_plus = mass * (
            1.0 + jnp.sqrt(jnp.clip(1.0 - spin * spin, 0.0, 1.0))
        )
        inv_3m = 1.0 / (3.0 * mass)

        def kerr_scalars(rx, ry, rz):
            """(r, f, l): Kerr-Schild radial coord, potential, null vector
            (bhx.kerr._kerr_scalars, component-wise for the VPU)."""
            rho2 = rx * rx + ry * ry + rz * rz
            b_ = rho2 - a2_k
            r2 = 0.5 * (
                b_ + jnp.sqrt(b_ * b_ + 4.0 * a2_k * rz * rz + 1e-20)
            )
            r2 = jnp.maximum(r2, 1e-12)
            r = jnp.sqrt(r2)
            f = 2.0 * mass * r2 * r / (r2 * r2 + a2_k * rz * rz + 1e-20)
            denom = r2 + a2_k
            lx = (r * rx + a_k * ry) / denom
            ly = (r * ry - a_k * rx) / denom
            lz = rz / r
            return r, f, lx, ly, lz

        def kerr_rhs(rx, ry, rz, qx, qy, qz):
            """Hamilton's equations: dx = p - f lp l; dp = -dH/dx with
            dH/dx from jax.vjp *inside the kernel* (elementwise math only,
            so it lowers to VPU code like the rest; bhx.kerr.rhs)."""
            _, f, lx, ly, lz = kerr_scalars(rx, ry, rz)
            lp = 1.0 + lx * qx + ly * qy + lz * qz
            flp = f * lp
            dxx = qx - flp * lx
            dxy = qy - flp * ly
            dxz = qz - flp * lz

            def h_of_x(ax, ay, az):
                _, f_, lx_, ly_, lz_ = kerr_scalars(ax, ay, az)
                lp_ = 1.0 + lx_ * qx + ly_ * qy + lz_ * qz
                return -0.5 * f_ * lp_ * lp_

            _, vjp = jax.vjp(h_of_x, rx, ry, rz)
            gx, gy, gz = vjp(jnp.ones_like(rx))
            return dxx, dxy, dxz, -gx, -gy, -gz

    # Crossing slots live in the output ref, not the loop carry.
    for k in range(K):
        base = OUT_FIXED + k * CROSS_FIELDS
        for f in range(CROSS_FIELDS):
            out_ref[base + f, 0] = zeros

    init = dict(
        px=px0, py=py0, pz=pz0, dx=dx0, dy=dy0, dz=dz0,
        h=h0,
        act=jnp.where(steps0 < budget, act0, 0.0),  # float 0/1: Mosaic cannot carry i1 vectors
        steps=zeros,
        closest2=(px0 - bx) ** 2 + (py0 - by) ** 2 + (pz0 - bz) ** 2,
        # Continue the running transmission bound across march rounds.
        amount_ub=amount0,
        horizon=zeros,
        exited=zeros,
        count=zeros,
        it=jnp.int32(0),
    )
    if kerr:
        init.update(
            qx=rays_ref[10, 0], qy=rays_ref[11, 0], qz=rays_ref[12, 0]
        )

    def accel(qx, qy, qz, h2):
        rx, ry, rz = qx - bx, qy - by, qz - bz
        r2 = rx * rx + ry * ry + rz * rz
        ir = jax.lax.rsqrt(r2 + 1e-12)
        ir2 = ir * ir
        inv_r5 = ir2 * ir2 * ir  # (r^2)^-2.5 without pow
        s = (-3.0) * mass * h2 * inv_r5
        return s * rx, s * ry, s * rz

    def norm3(x, y, z):
        inv = jax.lax.rsqrt(x * x + y * y + z * z + 1e-20)
        return x * inv, y * inv, z * inv

    def cond(s):
        return jnp.logical_and(
            s["it"] < kcfg.max_iterations, jnp.any(s["act"] > 0.5)
        )

    def substep(s):
        px, py, pz = s["px"], s["py"], s["pz"]
        dx, dy, dz = s["dx"], s["dy"], s["dz"]
        act = s["act"] > 0.5

        rx, ry, rz = px - bx, py - by, pz - bz
        cxv = ry * dz - rz * dy
        cyv = rz * dx - rx * dz
        czv = rx * dy - ry * dx
        h2 = cxv * cxv + cyv * cyv + czv * czv

        kerr_captured = None
        q_out = {}
        if kerr:
            # Hamiltonian RK4 on (x, p) with a field-strength-scaled step
            # (bhx.kerr.step_rk4 / adaptive_h); the "direction" for hit
            # tests / sky is the step segment's chord, like the jnp path
            # (bhx/tracer.py kerr branch).
            qx, qy, qz = s["qx"], s["qy"], s["qz"]
            r0, _, _, _, _ = kerr_scalars(rx, ry, rz)
            t_ = r0 * inv_3m
            hk = jnp.clip(
                p("step_size") * t_ * jnp.sqrt(t_), 2e-3, 1.0
            )
            k1 = kerr_rhs(rx, ry, rz, qx, qy, qz)
            k2 = kerr_rhs(
                rx + 0.5 * hk * k1[0], ry + 0.5 * hk * k1[1],
                rz + 0.5 * hk * k1[2],
                qx + 0.5 * hk * k1[3], qy + 0.5 * hk * k1[4],
                qz + 0.5 * hk * k1[5],
            )
            k3 = kerr_rhs(
                rx + 0.5 * hk * k2[0], ry + 0.5 * hk * k2[1],
                rz + 0.5 * hk * k2[2],
                qx + 0.5 * hk * k2[3], qy + 0.5 * hk * k2[4],
                qz + 0.5 * hk * k2[5],
            )
            k4 = kerr_rhs(
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
            # Capture: inside the (spin-dependent) outer horizon.
            r_new, _, _, _, _ = kerr_scalars(nrx, nry, nrz)
            kerr_captured = jnp.logical_and(applied, r_new <= r_plus)
            app3 = jnp.where(applied, 1.0, 0.0)
            q_out = dict(
                qx=app3 * nqx + (1.0 - app3) * qx,
                qy=app3 * nqy + (1.0 - app3) * qy,
                qz=app3 * nqz + (1.0 - app3) * qz,
            )
        elif kcfg.integrator == "euler":
            h_used = s["h"]
            ax, ay, az = accel(px, py, pz, h2)
            ndx, ndy, ndz = norm3(dx + ax * h_used, dy + ay * h_used, dz + az * h_used)
            npx = px + ndx * h_used
            npy = py + ndy * h_used
            npz = pz + ndz * h_used
            applied = act
            h_next = h_used
        else:
            h_used = s["h"]

            def stage(cx_, cy_, cz_):
                return accel(px + cx_ * h_used, py + cy_ * h_used, pz + cz_ * h_used, h2)

            k1 = accel(px, py, pz, h2)
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
            ratio = err / p("rtol")
            accept = ratio <= 1.0
            # Controller without pow: factor from two rsqrts.
            # ratio^-0.25 = rsqrt(rsqrt(ratio)); ratio^-0.2 ~ use -0.25 for
            # growth too (slightly more conservative growth, same clamps).
            r4 = jax.lax.rsqrt(jax.lax.rsqrt(ratio + 1e-12))
            grow = jnp.clip(p("safety") * r4, 1.0, p("max_f"))
            shrink = jnp.clip(p("safety") * r4, p("min_f"), 1.0)
            h_next = jnp.clip(h_used * jnp.where(accept, grow, shrink),
                              p("h_min"), p("h_max"))
            ndx, ndy, ndz = norm3(dx + h_used * ix, dy + h_used * iy, dz + h_used * iz)
            # Position advances along the old direction (reference parity).
            npx = px + dx * h_used
            npy = py + dy * h_used
            npz = pz + dz * h_used
            applied = jnp.logical_and(act, accept)

        if kerr:
            # Capture was detected on the Boyer-Lindquist radius of the
            # stepped position (r_new <= r_plus above): a terminal hit at
            # t = 0, exactly like the jnp kerr path (bhx/tracer.py).
            hit_h = kerr_captured
            t_h = jnp.where(kerr_captured, 0.0, 1e9)
        else:
            # --- segment hit tests: origin (px,py,pz), direction (new dir,
            # unit length), t in (0, h_used] (reference ray.wgsl:539-541) ---
            ox, oy, oz = px - bx, py - by, pz - bz
            half_b = ox * ndx + oy * ndy + oz * ndz
            c_q = ox * ox + oy * oy + oz * oz - horizon_r2
            disc4 = half_b * half_b - c_q  # disc/4 (a == 1 for unit dir)
            sq = jnp.sqrt(jnp.maximum(disc4, 0.0))
            t1 = -half_b - sq
            t2 = -half_b + sq
            v1 = jnp.logical_and(disc4 > 0.0, jnp.logical_and(t1 > 1e-8, t1 < h_used))
            v2 = jnp.logical_and(disc4 > 0.0, jnp.logical_and(t2 > 1e-8, t2 < h_used))
            t_h = jnp.where(v1, t1, jnp.where(v2, t2, 1e9))
            hit_h = jnp.logical_or(v1, v2)

        if kcfg.show_disk:
            denom = nx * ndx + ny * ndy + nz * ndz
            denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
            t_d = ((bx - px) * nx + (by - py) * ny + (bz - pz) * nz) / denom
            hx = px + ndx * t_d
            hy = py + ndy * t_d
            hz = pz + ndz * t_d
            rr2 = (hx - bx) ** 2 + (hy - by) ** 2 + (hz - bz) ** 2
            hit_d = jnp.logical_and(
                jnp.logical_and(t_d > 1e-8, t_d < h_used),
                jnp.logical_and(rr2 >= d_in2, rr2 <= d_out2),
            )
        else:
            hit_d = jnp.zeros_like(hit_h)
            t_d = jnp.full_like(t_h, 1e9)
            hx = hy = hz = zeros

        horizon_first = jnp.logical_and(hit_h, t_h <= t_d)
        crossing = jnp.logical_and(
            applied, jnp.logical_and(hit_d, jnp.logical_not(horizon_first))
        )
        hit_horizon = jnp.logical_and(applied, horizon_first)

        count = s["count"]
        amount_ub = s["amount_ub"]

        if kcfg.show_disk:
            # Opacity lower bound for early exit, pow-free:
            # x^1.3 >= x for x >= 1 and >= x^2 for x in [0,1]
            # (ray.wgsl:618-626 density -> od -> opacity).  Uses the
            # hole-relative radius for the first density factor (exact for
            # the origin-centered default; this is only an exit heuristic),
            # and derives rsqrt(rr) = sqrt(rsqrt(rr2)) — one rsqrt + one
            # sqrt for the whole block.
            irr = jax.lax.rsqrt(rr2 + 1e-20)
            rr = rr2 * irr
            inv_sqrt_rr = jnp.sqrt(irr)
            dens = 1.0 - rr * inv_d_out
            tt = jnp.clip(rr - d_in, 0.0, 1.0)
            dens = dens * (tt * tt * (3.0 - 2.0 * tt))
            dens = jnp.maximum(dens * inv_sqrt_rr, 0.0)
            x = 30.0 * dens
            od_lb = jnp.where(x < 1.0, x * x, x)
            op_lb = jnp.clip(od_lb * 0.2, 0.0, 1.0) * kcfg.tex_opacity_min

            @pl.when(jnp.any(crossing))
            def _record():
                for k in range(K):
                    base = OUT_FIXED + k * CROSS_FIELDS
                    put = jnp.logical_and(crossing, count == float(k))
                    out_ref[base + 0, 0] = jnp.where(put, hx, out_ref[base + 0, 0])
                    out_ref[base + 1, 0] = jnp.where(put, hy, out_ref[base + 1, 0])
                    out_ref[base + 2, 0] = jnp.where(put, hz, out_ref[base + 2, 0])
                    out_ref[base + 3, 0] = jnp.where(put, ndx, out_ref[base + 3, 0])
                    out_ref[base + 4, 0] = jnp.where(put, ndy, out_ref[base + 4, 0])
                    out_ref[base + 5, 0] = jnp.where(put, ndz, out_ref[base + 5, 0])
                    out_ref[base + 6, 0] = jnp.where(put, 1.0, out_ref[base + 6, 0])

            count = count + jnp.where(crossing, 1.0, 0.0)
            amount_ub = amount_ub * jnp.where(crossing, 1.0 - op_lb, 1.0)

        # --- advance state ---
        applied_f = jnp.where(applied, 1.0, 0.0)
        napplied_f = 1.0 - applied_f
        out_px = applied_f * npx + napplied_f * px
        out_py = applied_f * npy + napplied_f * py
        out_pz = applied_f * npz + napplied_f * pz
        out_dx = applied_f * ndx + napplied_f * dx
        out_dy = applied_f * ndy + napplied_f * dy
        out_dz = applied_f * ndz + napplied_f * dz
        h_out = jnp.where(act, h_next, s["h"])

        dist2 = (out_px - bx) ** 2 + (out_py - by) ** 2 + (out_pz - bz) ** 2
        closest2 = jnp.where(applied, jnp.minimum(s["closest2"], dist2), s["closest2"])

        exited_now = jnp.logical_and(applied, dist2 > rel_r2)
        absorbed = jnp.logical_or(
            hit_horizon, jnp.logical_and(act, amount_ub < cutoff)
        )
        horizon = jnp.where(hit_horizon, 1.0, s["horizon"])
        exited = jnp.where(exited_now, 1.0, s["exited"])
        steps = s["steps"] + jnp.where(act, 1.0, 0.0)
        act_out = jnp.where(
            jnp.logical_and(
                jnp.logical_and(act, steps0 + steps < budget),
                jnp.logical_not(jnp.logical_or(exited_now, absorbed)),
            ),
            1.0,
            0.0,
        )

        return dict(
            px=out_px, py=out_py, pz=out_pz, dx=out_dx, dy=out_dy, dz=out_dz,
            h=h_out, act=act_out, steps=steps, closest2=closest2,
            amount_ub=amount_ub, horizon=horizon, exited=exited,
            count=count, it=s["it"] + 1,
            **q_out,
        )

    inner_iters = max(1, kcfg.vote_every // kcfg.unroll)

    def body(s):
        def inner(_, ss):
            for _ in range(kcfg.unroll):
                ss = substep(ss)
            return ss

        if inner_iters == 1:
            return inner(0, s)
        return jax.lax.fori_loop(0, inner_iters, inner, s)

    final = jax.lax.while_loop(cond, body, init)

    out_ref[_OUT_FIXED["px"], 0] = final["px"]
    out_ref[_OUT_FIXED["py"], 0] = final["py"]
    out_ref[_OUT_FIXED["pz"], 0] = final["pz"]
    out_ref[_OUT_FIXED["dx"], 0] = final["dx"]
    out_ref[_OUT_FIXED["dy"], 0] = final["dy"]
    out_ref[_OUT_FIXED["dz"], 0] = final["dz"]
    out_ref[_OUT_FIXED["steps"], 0] = final["steps"]
    out_ref[_OUT_FIXED["closest"], 0] = jnp.sqrt(final["closest2"])
    out_ref[_OUT_FIXED["horizon"], 0] = final["horizon"]
    out_ref[_OUT_FIXED["exited"], 0] = final["exited"]
    out_ref[_OUT_FIXED["h"], 0] = final["h"]
    out_ref[_OUT_FIXED["amount"], 0] = final["amount_ub"]
    out_ref[_OUT_FIXED["count"], 0] = final["count"]
    if kerr:
        # Final conjugate momentum after the slot block — multi-round
        # marching resumes the Hamiltonian state from it.
        base = OUT_FIXED + CROSS_FIELDS * K
        out_ref[base + 0, 0] = final["qx"]
        out_ref[base + 1, 0] = final["qy"]
        out_ref[base + 2, 0] = final["qz"]


@functools.partial(jax.jit, static_argnames=("kcfg",))
def march_pallas(rays, params, kcfg: MarchKernelConfig):
    """Run the march kernel.

    rays: TUPLE of kcfg.in_fields float32 (N,) row arrays — px, py, pz,
    dx, dy, dz, h0, active, amount, steps_done [, qx, qy, qz for
    geodesics="kerr"] — N a multiple of kcfg.lanes.  params: (NUM_PARAMS,)
    float32 per _P.  Returns a tuple of kcfg.out_fields (N,) row arrays
    (OUT_FIXED fixed fields + 7K slot fields [, final momentum for kerr]).

    Tuple-of-rows I/O is load-bearing for throughput: every field is its
    own contiguous (tiles, s8, 128) array (a free reshape of the (N,)
    row), each per-tile DMA is one contiguous chunk, and callers never
    stack or slice a combined array.  A single (N, fields) array forced
    lane-granularity transposes (~20 ms/frame at 1080p,
    scripts/bisect_shade.py); a single (fields, N) array made each tile's
    DMA fields strided chunks (+20%% kernel time, scripts/bisect_l3.py).
    """
    fin = kcfg.in_fields
    fout = kcfg.out_fields
    assert len(rays) == fin, f"{len(rays)} ray fields, kcfg expects {fin}"
    n = rays[0].shape[0]
    lanes = kcfg.lanes
    s8 = kcfg.sublanes
    assert n % lanes == 0, f"ray count {n} not a multiple of {lanes}"
    tiles = n // lanes

    rays_r = [r.reshape(tiles, s8, 128) for r in rays]
    params2 = params.reshape(1, NUM_PARAMS)
    row_spec = pl.BlockSpec((1, s8, 128), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, kcfg=kcfg),
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((1, NUM_PARAMS), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ] + [row_spec] * fin,
        out_specs=[row_spec] * fout,
        out_shape=[
            jax.ShapeDtypeStruct((tiles, s8, 128), jnp.float32)
        ] * fout,
        interpret=kcfg.interpret,
    )(params2, *rays_r)

    return tuple(o.reshape(n) for o in out)


def pack_params(black_hole, disk_normal, cfg) -> jnp.ndarray:
    """Build the SMEM parameter vector from scene + config."""
    vals = [
        black_hole.position[0], black_hole.position[1], black_hole.position[2],
        black_hole.mass, black_hole.horizon_radius, black_hole.relativity_radius,
        disk_normal[0], disk_normal[1], disk_normal[2],
        black_hole.disk_inner, black_hole.disk_outer,
        jnp.float32(cfg.step_size), jnp.float32(cfg.opacity_cutoff),
        jnp.float32(cfg.rk_rtol), jnp.float32(cfg.rk_safety),
        jnp.float32(cfg.rk_min_factor), jnp.float32(cfg.rk_max_factor),
        jnp.float32(cfg.rk_h_min), jnp.float32(cfg.rk_h_max),
        jnp.float32(cfg.max_iterations),
        black_hole.spin,
    ]
    return jnp.stack([jnp.asarray(v, jnp.float32) for v in vals])
