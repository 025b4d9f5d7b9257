from porepy_tpu.fracs import meshing  # noqa: F401
