"""Probe the strata FLOOR/occlusion-fold ops at 1024^2 shapes.

demos/probe_1024.py showed every kernel stage of the 1024^3 stratum
passes in isolation — but it compacted on the HOST and never ran the
floor bookkeeping. This probe jits exactly the floor segment (pure
XLA: repeats, reshape-min, argsort compaction, scatter, gather-fold)
at the 1024^3 stratum shapes with random data, no Pallas at all.

If THIS faults the worker, the miscompile is in the pure-XLA floor
program and can be bisected further with --seg; if it passes, the
fault needs Pallas + floor composed in one program.

Usage: python demos/probe_floor.py [n] [seg]
  seg: all | proofs | compact | fold
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np


def main(n=1024, seg="all", ts=64, sub=16):
    nl = ts // sub
    nty = ntx = n // ts
    ntxy = nty * ntx
    ny2 = nx2 = n // sub
    nsub_s = nl * ny2 * nx2
    cap_s = min(4096, nsub_s)
    m = nl**3
    H = W = n
    BIG = jnp.int32(1 << 30)

    rng = np.random.default_rng(0)
    floor0 = jnp.asarray(
        rng.integers(0, n, size=(H, W)).astype(np.int32)
    )
    full = jnp.asarray(rng.random(ntxy) < 0.1)
    z0s = jnp.asarray(
        rng.integers(0, n // ts, size=ntxy).astype(np.float32) * ts
    )
    sub_full = jnp.asarray(rng.random((ntxy, m)) < 0.1)
    sub_active = jnp.asarray(rng.random((ntxy, m)) < 0.3) & ~sub_full
    dcand = jnp.asarray(
        rng.integers(0, n, size=(cap_s, sub, sub)).astype(np.int32)
    )

    def to_dense(flags):
        g = flags.reshape(nty, ntx, nl, nl, nl)
        return g.transpose(2, 0, 3, 1, 4).reshape(nl, ny2, nx2)

    def proofs(floor):
        full_px = jnp.repeat(
            jnp.repeat(
                jnp.where(full, z0s + ts, 0.0)
                .reshape(nty, ntx).astype(jnp.int32),
                ts, 0,
            ),
            ts, 1,
        )
        floor = jnp.maximum(floor, full_px)
        z_lo = z0s[0]
        lz_col = jnp.arange(nl, dtype=jnp.int32)[:, None, None]
        sub_top = z_lo.astype(jnp.int32) + lz_col * sub + sub
        full_d = to_dense(sub_full)
        proof_sub = jnp.where(full_d, sub_top, 0).max(0)
        floor = jnp.maximum(
            floor, jnp.repeat(jnp.repeat(proof_sub, sub, 0), sub, 1)
        )
        return floor, sub_top

    def compact(floor, sub_top):
        floor_min = floor.reshape(ny2, sub, nx2, sub).min((1, 3))
        active_d = to_dense(sub_active) & (sub_top > floor_min[None])
        act_flat = active_d.reshape(-1)
        n_active = act_flat.sum()
        lz_f = jnp.arange(nsub_s, dtype=jnp.int32) // (ny2 * nx2)
        key = jnp.where(act_flat, nl - lz_f, BIG)
        order = jnp.argsort(key)[:cap_s]
        valid = act_flat[order]
        return order, valid, n_active

    def fold(floor, order, valid):
        slot_of = (
            jnp.full(nsub_s, cap_s, jnp.int32)
            .at[order]
            .set(jnp.where(
                valid, jnp.arange(cap_s, dtype=jnp.int32), cap_s
            ))
        )
        dcand_pad = jnp.concatenate(
            [dcand, jnp.zeros((1, sub, sub), jnp.int32)], axis=0
        )
        dense = dcand_pad[slot_of]
        slab_vox = (
            dense.reshape(nl, ny2, nx2, sub, sub)
            .transpose(0, 1, 3, 2, 4)
            .reshape(nl, H, W)
            .max(axis=0)
        )
        return jnp.maximum(floor, slab_vox)

    def run_all(floor):
        floor, sub_top = proofs(floor)
        order, valid, n_active = compact(floor, sub_top)
        floor = fold(floor, order, valid)
        return floor, n_active

    t0 = time.perf_counter()
    if seg == "all":
        f, na = jax.jit(run_all)(floor0)
        print("all:", int(f.sum()), int(na), flush=True)
    elif seg == "proofs":
        f, st = jax.jit(proofs)(floor0)
        print("proofs:", int(f.sum()), flush=True)
    elif seg == "compact":
        _, st = jax.jit(proofs)(floor0)
        o, v, na = jax.jit(lambda fl: compact(fl, st))(floor0)
        print("compact:", int(na), flush=True)
    elif seg == "fold":
        rngo = np.random.default_rng(1)
        order = jnp.asarray(
            rngo.permutation(nsub_s)[:cap_s].astype(np.int32)
        )
        valid = jnp.asarray(rngo.random(cap_s) < 0.9)
        f = jax.jit(lambda fl: fold(fl, order, valid))(floor0)
        print("fold:", int(f.sum()), flush=True)
    print(f"seg={seg} ok {time.perf_counter()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    seg = sys.argv[2] if len(sys.argv) > 2 else "all"
    main(n, seg)
