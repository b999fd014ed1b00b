# chiron_tpu container image (parity: the reference's Dockerfile.py3.{cpu,gpu}).
#
# The TPU runtime is provided by the host (Cloud TPU VM images ship libtpu);
# this image carries the framework, its native library, and the CLI.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ make && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/chiron_tpu
COPY setup.py README.md ./
COPY chiron_tpu ./chiron_tpu

# jax[tpu] resolves to the libtpu-enabled build on Cloud TPU VMs; on CPU-only
# hosts install plain jax instead.
RUN pip install --no-cache-dir "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    h5py numpy && pip install --no-cache-dir .

# build the native library (DTW resquiggler + fast signal parser)
RUN make -C chiron_tpu/native

ENTRYPOINT ["chiron"]
CMD ["--help"]
