"""Worker for the multi-process `jax.distributed` test (see
test_multihost.py). Launched twice: `python multihost_worker.py <proc> <port>`.

Each process owns 2 virtual CPU devices; together they form the same
(kf=2, pt=2) mesh a 2-host TPU slice would, with cross-process collectives
over Gloo standing in for DCN. The sharded NID loss must match the
single-process value computed from the identical full arrays.
"""

import os
import sys


def main():
    proc, port = int(sys.argv[1]), sys.argv[2]
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2, process_id=proc
    )
    import jax.numpy as jnp
    import numpy as np

    from pointcloudprocessor_tpu.core import se3
    from pointcloudprocessor_tpu.opt import nid
    from pointcloudprocessor_tpu.parallel import mesh as mesh_lib
    from pointcloudprocessor_tpu.parallel import nid_shard

    from synthetic import simple_camera
    from test_nid import make_keyframe, nid_scene

    camera = simple_camera()
    pts, inten, img = nid_scene(camera)
    kf = make_keyframe(camera, pts, inten, img)
    k = 2
    full = nid.NIDKeyframe(
        points=np.broadcast_to(np.asarray(kf.points), (k,) + kf.points.shape),
        intensity=np.broadcast_to(np.asarray(kf.intensity), (k,) + kf.intensity.shape),
        valid=np.broadcast_to(np.asarray(kf.valid), (k,) + kf.valid.shape),
        bin_image=np.broadcast_to(np.asarray(kf.bin_image), (k,) + kf.bin_image.shape),
    )

    mesh = mesh_lib.make_mesh(kf=2, pt=2)  # 4 global devices over 2 processes

    def place(arr, sharding):
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx]
        )

    kf_pt = mesh_lib.keyframe_sharding(mesh)
    kf_only = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(mesh_lib.KF_AXIS)
    )
    kfs = nid.NIDKeyframe(
        points=place(full.points, kf_pt),
        intensity=place(full.intensity, kf_pt),
        valid=place(full.valid, kf_pt),
        bin_image=place(full.bin_image, kf_only),
    )

    T = se3.exp(jnp.asarray([0.01, -0.005, 0.002, 0.003, -0.001, 0.002], jnp.float32))
    sharded = float(nid_shard.sharded_multi_nid_loss(camera, T, kfs, mesh))

    # Single-process reference from the identical full arrays (local CPU).
    local = float(
        nid.multi_nid_loss(
            camera,
            T,
            nid.NIDKeyframe(
                jnp.asarray(full.points),
                jnp.asarray(full.intensity),
                jnp.asarray(full.valid),
                jnp.asarray(full.bin_image),
            ),
        )
    )
    ok = abs(sharded - local) < 1e-4
    print(f"proc {proc}: sharded={sharded:.6f} local={local:.6f} "
          f"{'MULTIHOST_OK' if ok else 'MULTIHOST_MISMATCH'}", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
