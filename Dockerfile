# Reproducible runtime environment — the rebuild of the reference's Docker
# setup (its ROS-Noetic image building qhull/ceres/iridescence from source).
# This engine needs only Python + JAX (+ a C++ toolchain for the native host-IO
# codec); on TPU VMs install the matching jax[tpu] wheel instead of jax[cpu].

FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY pointcloudprocessor_tpu ./pointcloudprocessor_tpu
COPY native ./native
COPY run_pcd_colorization.sh bench.py ./

# CPU JAX by default; override for TPU hosts:
#   pip install 'jax[tpu]' -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
RUN pip install --no-cache-dir "jax[cpu]" numpy opencv-python-headless matplotlib scipy \
    && pip install --no-cache-dir -e . \
    && make -C native

ENTRYPOINT ["python", "-m", "pointcloudprocessor_tpu.cli"]
