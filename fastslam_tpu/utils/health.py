"""Failure detection and recovery — greenfield (SURVEY.md §5).

The reference's only resilience is a silent weight-collapse reset
(``fast_slam_2.py:168-170``) and a viewer that tolerates torn JSON.  For a
long-running production filter we watch for the real failure modes:

* **NaN/Inf poisoning** — one bad measurement propagates through the whole
  SoA state in a step;
* **weight degeneracy** — Neff pinned at 1 for many consecutive ticks means
  the proposal has diverged from the posterior;
* **map overflow** — particles whose landmark slots are exhausted silently
  drop new landmarks (core/kernels.py capacity guard);
* **estimate divergence** — the pose jumping further per tick than physics
  allows.

``HealthMonitor.check`` runs on the host against cheap scalar device
fetches; ``recover`` rebuilds a clean state from the last good checkpoint
(or reinitializes, keeping the pose).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from fastslam_tpu.config import FastSLAMConfig
from fastslam_tpu.core.state import FilterState, init_state


@dataclass
class HealthReport:
    ok: bool
    issues: List[str] = field(default_factory=list)
    neff: float = 0.0
    map_fill_frac: float = 0.0
    step_jump_m: float = 0.0


@dataclass
class HealthMonitor:
    config: FastSLAMConfig
    max_step_jump_m: float = 1.0         # max plausible per-tick pose jump
    degenerate_ticks_limit: int = 20     # consecutive Neff==1-ish ticks
    map_full_warn_frac: float = 0.9

    _degenerate_streak: int = 0
    _prev_pose: Optional[np.ndarray] = None

    def check(self, state: FilterState, pose) -> HealthReport:
        import jax.numpy as jnp

        issues = []
        pose = np.asarray(pose)

        finite = bool(
            np.isfinite(np.asarray(state.log_weights)).all()
            and np.isfinite(pose).all()
        )
        if not finite:
            issues.append("nan_or_inf_state")

        w = np.exp(np.asarray(state.log_weights, np.float64))
        s = float((w * w).sum())
        n = state.num_particles
        neff = n if s < 1.0 / n else 1.0 / max(s, 1e-300)
        if neff <= 2.0:
            self._degenerate_streak += 1
        else:
            self._degenerate_streak = 0
        if self._degenerate_streak >= self.degenerate_ticks_limit:
            issues.append("weight_degeneracy")

        fill = float(np.asarray(state.lm_count).mean()) / state.max_landmarks
        if fill >= self.map_full_warn_frac:
            issues.append("map_near_capacity")

        jump = 0.0
        if self._prev_pose is not None and finite:
            jump = float(np.linalg.norm(pose[:2] - self._prev_pose[:2]))
            if jump > self.max_step_jump_m:
                issues.append("estimate_jump")
        self._prev_pose = pose if finite else self._prev_pose

        return HealthReport(
            ok=not issues, issues=issues, neff=float(neff),
            map_fill_frac=fill, step_jump_m=jump,
        )

    def recover(self, state: FilterState, pose,
                checkpoint_path: Optional[str] = None) -> FilterState:
        """Rebuild a usable state: resume from checkpoint if given, else
        reinitialize all particles at the last finite pose with fresh maps."""
        if checkpoint_path:
            from fastslam_tpu.io.checkpoint import load_checkpoint

            try:
                st, _ = load_checkpoint(checkpoint_path)
                return st
            except (OSError, ValueError):
                pass
        import jax.numpy as jnp

        pose = np.asarray(pose)
        if not np.isfinite(pose).all():
            pose = self._prev_pose if self._prev_pose is not None else np.zeros(3)
        st = init_state(self.config, rng=0)
        poses = jnp.broadcast_to(
            jnp.asarray(pose, st.poses.dtype), st.poses.shape
        )
        self._degenerate_streak = 0
        return st._replace(poses=poses, rng=state.rng)
