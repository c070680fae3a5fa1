"""Worker for test_distributed.py: one of two `jax.distributed`
processes (4 virtual CPU devices each -> a global 8-device mesh).

Drives the sharded render/fit entry points across a REAL process
boundary (Gloo CPU collectives) and checks them against process-local
oracles. Usage: python distributed_worker.py <process_id> <port>
"""
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    pid = int(sys.argv[1])
    port = int(sys.argv[2])
    jax.distributed.initialize(
        f"localhost:{port}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8

    import jax.numpy as jnp

    from fidget_tpu import Context, lower
    from fidget_tpu.core.var import Var
    from fidget_tpu.parallel.sharding import (
        _to_host,
        fit_step,
        make_mesh,
        render_sharded,
        render_tiles_sharded,
        render_unrolled_sharded,
    )
    from fidget_tpu.render.region import ImageSize
    from fidget_tpu.render.render2d import PixelRenderer

    mesh = make_mesh()  # all 8 devices across both processes
    assert mesh.devices.size == 8

    ctx = Context()
    v = Var.new()
    f = ctx.sub(
        ctx.sqrt(ctx.add(ctx.square(ctx.x()), ctx.square(ctx.y()))),
        ctx.input(v),
    )
    tape = lower(ctx, [f])
    size = ImageSize(256, 256)

    # process-local oracle (no sharding, default device)
    rloc = PixelRenderer(tape, size, interpret=True)
    brute = rloc.render_brute(vars={v: 0.65})

    # 1) dense row-sharded render across processes
    img = _to_host(render_sharded(tape, size, mesh, params={v: 0.65}))
    assert img.shape == (256, 256)
    np.testing.assert_allclose(img, brute, rtol=1e-5, atol=1e-6)
    print(f"[{pid}] render_sharded OK", flush=True)

    # 2) full MPR tiled pipeline, rows sharded across processes
    img2 = render_tiles_sharded(
        tape, size, mesh, tile_sizes=(32,), vars={v: 0.65},
        interpret=True,
    )
    np.testing.assert_array_equal(img2.inside(), brute < 0)
    print(f"[{pid}] render_tiles_sharded OK", flush=True)

    # 3) tiled-unrolled with post-cull rebalancing (all_gather across
    # the process boundary)
    img3 = render_unrolled_sharded(
        tape, size, mesh, tile_size=32, vars={v: 0.65}, interpret=True
    )
    np.testing.assert_array_equal(img3.inside(), brute < 0)
    print(f"[{pid}] render_unrolled_sharded OK", flush=True)

    # 4) data-parallel fit: psum'd gradients across processes drive the
    # loss down and both processes agree on the result
    target = np.asarray(brute, np.float32)
    params = {v: 0.3}
    losses = []
    for _ in range(5):
        params, loss = fit_step(tape, size, mesh, params, target, lr=0.5)
        losses.append(loss)
    assert losses[-1] < losses[0] * 0.2, losses
    assert abs(float(params[v]) - 0.65) < 0.05, params
    print(f"[{pid}] fit_step OK {losses[0]:.4f}->{losses[-1]:.4f} "
          f"r={float(params[v]):.3f}", flush=True)
    print(f"[{pid}] ALL OK", flush=True)


if __name__ == "__main__":
    main()
