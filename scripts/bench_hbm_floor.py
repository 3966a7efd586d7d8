"""HBM streaming floor probe: a trivial Pallas copy kernel over the exact
buffer set the fused update reads+writes (6 [L, P] planes in/out + rows).
If this takes ~as long as the fused kernel at M=0..1, the kernel is at the
machine's effective memcpy floor and further VPU-op tuning can't help the
fixed cost.

Usage: python scripts/bench_hbm_floor.py [--particles 100352] [--landmarks 64]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=100352)
    ap.add_argument("--landmarks", type=int, default=64)
    ap.add_argument("--tile", type=int, default=2048)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    l, p, tile = args.landmarks, args.particles, args.tile
    assert p % tile == 0

    def copy_kernel(*refs):
        ins, outs = refs[:7], refs[7:]
        for i, o in zip(ins, outs):
            o[:, :] = i[:, :] + 1.0

    plane = pl.BlockSpec((l, tile), lambda i: (0, i))
    row = pl.BlockSpec((1, tile), lambda i: (0, i))
    fn = pl.pallas_call(
        copy_kernel,
        grid=(p // tile,),
        in_specs=[plane] * 6 + [row],
        out_specs=[plane] * 6 + [row],
        out_shape=[jax.ShapeDtypeStruct((l, p), jnp.float32)] * 6
        + [jax.ShapeDtypeStruct((1, p), jnp.float32)],
        interpret=args.cpu,
    )

    planes = [jnp.zeros((l, p), jnp.float32) + i for i in range(6)]
    rowv = jnp.zeros((1, p), jnp.float32)

    def body(carry, _):
        outs = fn(*carry)
        return tuple(outs), outs[6][0, 0]

    multi = jax.jit(
        lambda c: jax.lax.scan(body, c, None, length=args.k),
        donate_argnums=0,
    )
    c = tuple(planes + [rowv])
    c2, _ = multi(c)
    jax.block_until_ready(c2)
    t0 = time.perf_counter()
    c3, _ = multi(c2)
    jax.block_until_ready(c3)
    dt = (time.perf_counter() - t0) / args.k

    bytes_moved = 2 * (6 * l * p + p) * 4
    print(json.dumps({
        "copy_ms": round(dt * 1e3, 3),
        "gbps": round(bytes_moved / dt / 1e9, 1),
        "tile": tile,
    }))


if __name__ == "__main__":
    main()
