from porepy_tpu.utils import common_constants  # noqa: F401
