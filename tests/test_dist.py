"""Distributed tests on the 8-virtual-CPU-device mesh (SURVEY.md §4.4):
sharded render == single-device render; sharded train step runs and
all-reduces parameter gradients."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bhx.parallel import (
    TILE_AXIS,
    apply_params,
    make_optimizer,
    scene_params,
    tile_mesh,
    trace_image_sharded,
    train_step,
)
from bhx.tracer import trace_image_record

from tests.common import DIFF_CFG, FAST_CFG, small_scene


def test_eight_devices_present():
    assert len(jax.devices()) >= 8


def test_sharded_trace_matches_single_device():
    scene = small_scene()
    mesh = tile_mesh(jax.devices()[:8])
    # Height 40 = 8 x 5 rows per device.
    cfg = dataclasses.replace(FAST_CFG, width=48, height=40)
    img_sharded = np.asarray(
        trace_image_sharded(scene, cfg, mesh, cfg.width, cfg.height)
    )
    img_single = np.asarray(trace_image_record(scene, cfg, cfg.width, cfg.height))
    np.testing.assert_allclose(img_sharded, img_single, atol=2e-4)


def test_sharded_pallas_interpret_matches_single_device():
    """The PRODUCTION march path (Pallas kernel, interpret mode on CPU)
    under sharding == single-device — the kernel-path distribution seam
    (VERDICT r3 missing #2): pallas modes ride shard_map (GSPMD cannot
    partition an opaque pallas_call), so this checks that per-device
    kernel launches on local ray shards reproduce the dense result."""
    scene = small_scene()
    mesh = tile_mesh(jax.devices()[:8])
    cfg = dataclasses.replace(
        FAST_CFG, width=48, height=40, march_mode="pallas_interpret",
        max_iterations=200,
    )
    img_sharded = np.asarray(
        trace_image_sharded(scene, cfg, mesh, cfg.width, cfg.height)
    )
    img_single = np.asarray(
        trace_image_record(scene, cfg, cfg.width, cfg.height)
    )
    np.testing.assert_allclose(img_sharded, img_single, atol=2e-4)


def test_sharded_trace_handles_ragged_rows():
    scene = small_scene()
    mesh = tile_mesh(jax.devices()[:8])
    cfg = dataclasses.replace(FAST_CFG, width=48, height=37)  # 37 % 8 != 0
    img_sharded = np.asarray(
        trace_image_sharded(scene, cfg, mesh, cfg.width, cfg.height)
    )
    assert img_sharded.shape == (37, 48, 8)
    img_single = np.asarray(trace_image_record(scene, cfg, cfg.width, cfg.height))
    np.testing.assert_allclose(img_sharded, img_single, atol=2e-4)


@pytest.mark.slow
def test_bench_scaling_harness():
    """The scaling harness (BASELINE.md 'N-host scaling eff.') runs on the
    virtual mesh and reports sane rows.  Virtual devices share 2 host
    cores, so hardware-scaling ``efficiency`` is meaningless here; what IS
    measurable is ``overhead_efficiency`` — the 8-way-sharded program must
    deliver >= 0.8x the single-device throughput on the same total work,
    or GSPMD partitioning itself is adding cost.  Real hardware-scaling
    gates run on chips (SCALING.json records the platform).
    """
    from bhx.parallel import bench_scaling

    scene = small_scene()
    # Enough rows per device (10 at n=8) to amortize per-shard dispatch;
    # at 48x40 the 8-way split leaves 5 rows/device and overhead shows.
    cfg = dataclasses.replace(FAST_CFG, width=96, height=80)
    rows = bench_scaling(
        scene, cfg, device_counts=[1, 2, 4, 8], repeats=3, width=96, height=80
    )
    assert [r["devices"] for r in rows] == [1, 2, 4, 8]
    for r in rows:
        assert np.isfinite(r["rays_per_s"]) and r["rays_per_s"] > 0
        assert np.isfinite(r["efficiency"]) and r["efficiency"] > 0
    assert rows[0]["efficiency"] == 1.0
    assert rows[-1]["overhead_efficiency"] >= 0.8, rows[-1]


@pytest.mark.slow
def test_train_step_sharded_decreases_loss():
    from jax.sharding import NamedSharding, PartitionSpec as P

    scene = small_scene()
    mesh = tile_mesh(jax.devices()[:8])
    cfg = dataclasses.replace(DIFF_CFG, width=32, height=16, max_iterations=60)

    optimizer = make_optimizer(5e-3)
    params = scene_params(scene)
    opt_state = optimizer.init(params)

    # Target: the scene itself with a slightly different mass.
    bh = dataclasses.replace(scene.black_hole, mass=jnp.float32(0.55))
    target_scene = dataclasses.replace(scene, black_hole=bh)
    from bhx.pipeline import render

    target = render(target_scene, cfg)
    target = jax.device_put(target, NamedSharding(mesh, P(TILE_AXIS)))
    replicated = NamedSharding(mesh, P())
    params = jax.device_put(params, replicated)
    scene_r = jax.device_put(scene, replicated)

    losses = []
    for _ in range(5):
        params, opt_state, loss = train_step(
            params, opt_state, scene_r, target, cfg, optimizer
        )
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
    # Replicated param shards must stay identical across devices
    # (grads all-reduced consistently).
    mass = params["mass"]
    vals = [np.asarray(s.data) for s in mass.addressable_shards]
    for v in vals[1:]:
        np.testing.assert_array_equal(vals[0], v)


def test_init_distributed_failure_surfaced_cleanly(monkeypatch):
    """Cluster bring-up failures carry actionable context (coordinator
    address + process identity) instead of a bare RPC traceback
    (SURVEY.md §5 "Failure detection")."""
    import jax
    import pytest

    from bhx.parallel import init_distributed

    def boom(**kw):
        raise ConnectionError("rendezvous timed out")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    with pytest.raises(RuntimeError, match=r"coordinator='badhost:1'.*"
                       r"num_processes=2.*reachable"):
        init_distributed(coordinator="badhost:1", num_processes=2,
                         process_id=0)


def test_init_distributed_noop_without_coordinator(monkeypatch):
    """No coordinator configured -> plain local backend, never raises."""
    import jax

    from bhx.parallel import init_distributed

    def boom(**kw):  # must not be reached
        raise AssertionError("initialize called without coordinator")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    init_distributed()
