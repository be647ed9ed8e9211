# unires-tpu runtime image (parity with the reference's Dockerfile, which
# builds nitorch's CUDA backend — here the accelerator stack is jax[tpu],
# so the image is pure-Python plus the pinned JAX/libtpu pair).
#
# Build:  docker build -t unires-tpu:0.2 .
# Run  :  docker run --rm --privileged -v /dev:/dev unires-tpu:0.2 \
#             unires /data/t1.nii --vx 1.0
# (--privileged + /dev for TPU VM device access; on GKE use the TPU device
#  plugin instead.)
FROM python:3.12-slim

RUN pip install --no-cache-dir \
    "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    numpy scipy matplotlib

WORKDIR /opt/unires-tpu
COPY pyproject.toml README.md ./
COPY unires_tpu ./unires_tpu
RUN pip install --no-cache-dir .

# persistent XLA compilation cache across container restarts
ENV JAX_COMPILATION_CACHE_DIR=/var/cache/unires_tpu_jax
VOLUME /var/cache/unires_tpu_jax

ENTRYPOINT ["unires"]
