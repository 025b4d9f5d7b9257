from porepy_tpu.geometry import map_geometry  # noqa: F401
