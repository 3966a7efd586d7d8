"""Empirical VPU/VMEM roofline calibration for the measurement loop.

docs/ROOFLINE.md models the fused kernel's measurement loop as N
[L, T]-pass-equivalents per measurement.  This script measures what ONE
pass actually sustains on this chip, with kernels shaped exactly like the
real one (same [L, tile] blocks, same grid, VMEM-resident):

* ``mul_add`` — a*b+c per element, 3 reads 1 write per pass: the VMEM-
  bandwidth-bound regime the real loop lives in.
* ``fma_chain`` — 8 dependent FMAs on ONE block per pass (1 read 1 write,
  8 ops): approaches the VPU ALU ceiling.

Prints one JSON line with sustained elements/s for each, plus the derived
per-pass time for the production kernel's geometry — the numbers the
roofline doc checks the measured loop against.

Usage (TPU): python scripts/bench_vpu_roofline.py [--particles 100352]
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np



def _enable_compilation_cache():
    import jax, os
    d = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                       os.path.expanduser("~/.cache/jax_fastslam"))
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=100_352)  # 784*128
    ap.add_argument("--landmarks", type=int, default=64)
    ap.add_argument("--passes", type=int, default=256,
                    help="[L, T] passes per kernel invocation")
    ap.add_argument("--k", type=int, default=30, help="scan length")
    ap.add_argument("--tile", type=int, default=256)
    args = ap.parse_args()

    import jax

    _enable_compilation_cache()
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    l, p, tile = args.landmarks, args.particles, args.tile
    assert p % tile == 0
    grid = (p // tile,)
    npass = args.passes

    def mul_add_kernel(a_ref, b_ref, c_ref, o_ref):
        a = a_ref[:, :]
        b = b_ref[:, :]
        c = c_ref[:, :]

        def body(i, c):
            # 3 reads + 1 write per pass; new value feeds the next pass so
            # nothing folds away
            return a * b + c * 0.9999

        o_ref[:, :] = jax.lax.fori_loop(0, npass, body, c)

    def fma_chain_kernel(a_ref, o_ref):
        x = a_ref[:, :]

        def body(i, x):
            # 8 dependent FMAs per pass on the same block: ALU-bound
            for _ in range(8):
                x = x * 1.0000001 + 1e-7
            return x

        o_ref[:, :] = jax.lax.fori_loop(0, npass, body, x)

    spec = pl.BlockSpec((l, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((l, p), jnp.float32)

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(l, p)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(l, p)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(l, p)), jnp.float32)

    def timed(fn, *xs):
        call = jax.jit(
            lambda *xs: jax.lax.scan(
                lambda carry, _: (fn(*xs[:-1], carry), 0.0), xs[-1], None,
                length=args.k)[0]
        )
        out = call(*xs)
        jax.block_until_ready(out)
        np.asarray(out[0, :8])          # host readback sync (axon quirk)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            out = call(*xs)
            jax.block_until_ready(out)
            np.asarray(out[0, :8])
            best = min(best, time.perf_counter() - t0)
        return best / args.k

    mul_add = lambda a, b, c: pl.pallas_call(
        mul_add_kernel, grid=grid, in_specs=[spec] * 3, out_specs=spec,
        out_shape=out_shape)(a, b, c)
    fma = lambda a: pl.pallas_call(
        fma_chain_kernel, grid=grid, in_specs=[spec], out_specs=spec,
        out_shape=out_shape)(a)

    t_mul = timed(mul_add, a, b, c)
    t_fma = timed(fma, a)

    elems = l * p
    mul_rate = npass * elems / t_mul          # elements/s, 3R+1W passes
    fma_rate = npass * 8 * elems / t_fma      # FMA ops/s, register-resident

    print(json.dumps({
        "geometry": {"L": l, "P": p, "tile": tile, "passes": npass},
        "mul_add_pass_us": round(t_mul / npass * 1e6, 3),
        "mul_add_elements_per_s": round(mul_rate / 1e9, 2),
        "fma_ops_per_s_G": round(fma_rate / 1e9, 2),
        "per_LT_pass_us_at_P": round(elems / mul_rate * 1e6, 2),
        "note": "mul_add = VMEM-streaming pass (3R+1W); fma_chain = ALU "
                "ceiling (dependent, register-resident)",
    }))


if __name__ == "__main__":
    main()
