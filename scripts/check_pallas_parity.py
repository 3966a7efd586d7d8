"""Hardware parity check: the fused Pallas kernel on TPU must match the XLA
scan path on CPU (same seeded state, same measurements).

This is the real-silicon validation of the in-kernel polynomial atan2 /
angle-addition trig and the fori_loop measurement scan — interpret-mode tests
only prove the Python-level math.  f32 tolerance: fusion order differs across
backends, and the polynomial atan2 is accurate to ~1e-7 rad.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run(platform: str, use_pallas: bool, steps: int = 3):
    import subprocess
    import json

    code = f"""
import jax
{"jax.config.update('jax_platforms','cpu')" if platform == "cpu" else ""}
import sys; sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
import jax.numpy as jnp, numpy as np
from fastslam_tpu.config import FastSLAMConfig
from fastslam_tpu.core import kernels
from fastslam_tpu.core.state import init_state, pad_measurements

cfg = FastSLAMConfig(num_particles=800, max_landmarks=64, max_measurements=16,
                     use_pallas={use_pallas})
st = init_state(cfg, rng=0)
ms = pad_measurements(cfg, [(2.0 + 0.3 * i, -2.5 + 0.35 * i) for i in range(16)])
step = jax.jit(lambda s, r, t, m: kernels.fastslam_step(s, r, t, m, cfg))
for _ in range({steps}):
    st, pose = step(st, jnp.float32(0.0), jnp.float32(0.4), ms)
np.savez('/tmp/claude-0/parity_{platform}.npz',
         poses=np.asarray(st.poses), logw=np.asarray(st.log_weights),
         mean=np.asarray(st.lm_mean), cov=np.asarray(st.lm_cov),
         cnt=np.asarray(st.lm_count), pose=np.asarray(pose))
print('done', jax.devices()[0].platform)
"""
    subprocess.run([sys.executable, "-c", code], check=True)


def main():
    run("cpu", use_pallas=False)
    run("tpu", use_pallas=True)

    a = np.load("/tmp/claude-0/parity_cpu.npz")
    b = np.load("/tmp/claude-0/parity_tpu.npz")

    np.testing.assert_array_equal(a["cnt"], b["cnt"])
    for key, tol in [("poses", 1e-5), ("mean", 5e-4), ("cov", 5e-4),
                     ("logw", 5e-3), ("pose", 1e-5)]:
        diff = np.max(np.abs(a[key] - b[key]))
        print(f"{key}: max |diff| = {diff:.3e} (tol {tol})")
        assert diff < tol, f"{key} mismatch: {diff}"
    print("PARITY OK: TPU Pallas == CPU scan path")


if __name__ == "__main__":
    main()
