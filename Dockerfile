# TPU-native TRASE container (reference analogue: /root/reference/Dockerfile,
# which builds torch+CUDA and compiles the two CUDA submodules; here the
# compute path is jax[tpu]/Pallas, so there is nothing to compile except
# the optional native host-IO helper, built with plain g++).
#
# Build:   docker build -t trase-tpu .
# Run on a TPU VM (the TPU runtime is exposed by the host):
#   docker run --rm --privileged --net=host \
#       -v /path/to/data:/data trase-tpu \
#       python train.py -s /data/scene -m /data/out --eval
# CPU-only (tests, tooling):
#   docker run --rm -e JAX_PLATFORMS=cpu trase-tpu python -m pytest tests/ -q
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make ffmpeg \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/trase_tpu
COPY requirements.txt ./

# TPU jax wheel; harmless on CPU-only hosts (falls back to the CPU client)
RUN pip install --no-cache-dir "jax[tpu]" \
        -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir -r requirements.txt \
    && pip install --no-cache-dir torch --index-url \
        https://download.pytorch.org/whl/cpu

COPY . .

# optional multithreaded host-IO kernel (numpy fallback exists if this
# is skipped); see trase_tpu/native.py
RUN make -C native 2>/dev/null || true

# Pretrained VGG16 + LPIPS weights for style transfer / LPIPS metrics
# (needs egress; skipped silently in sandboxed builds — the trainers
# fall back to seeded-random convs and LPIPS returns None)
RUN python tools/fetch_vgg_weights.py || true

ENV PYTHONUNBUFFERED=1
CMD ["python", "-m", "pytest", "tests/", "-q"]
