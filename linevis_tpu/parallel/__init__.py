from linevis_tpu.parallel.mesh import make_device_mesh, render_opaque_sharded  # noqa: F401
