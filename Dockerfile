# TPU-native FastSLAM engine image.
#
# The reference ships a Dockerfile (reference Dockerfile:1-23) that builds on
# the JdeRobot simulator image and pip-installs the fast_slam_2 package; this
# engine has no simulator dependency — it deploys as a plain Python package
# over a JAX runtime.  The default base is CPU JAX (runs anywhere, used for
# the image smoke test); on a TPU VM swap the pip line for the libtpu extra
# as commented.
#
# Build:  docker build -t fastslam-tpu .
# Smoke:  docker run --rm fastslam-tpu
#         (records a 512-tick synthetic log and runs 1024-particle
#          production SLAM on it — the same pipeline deploy/launch.sh runs,
#          smoke-tested in this repo's CI-fashion record in docs/DEPLOY.md)
# Real:   docker run --rm -e PARTICLES=100000 -e TICKS=2000 -e CHUNK=8 \
#             --privileged fastslam-tpu        # TPU VM (privileged for TPU)
FROM python:3.11-slim

WORKDIR /app

# JAX first (CPU wheel; on a TPU VM use: pip install "jax[tpu]" -f \
# https://storage.googleapis.com/jax-releases/libtpu_releases.html)
RUN pip install --no-cache-dir "jax>=0.4.30" numpy

COPY pyproject.toml ./
COPY fastslam_tpu ./fastslam_tpu
COPY native ./native
COPY deploy ./deploy
RUN pip install --no-cache-dir .

# the deploy smoke pipeline: record a synthetic log, run production SLAM,
# print metrics JSON (PARTICLES/TICKS/CHUNK env-tunable)
ENV SKIP_INSTALL=1
CMD ["bash", "deploy/launch.sh"]
