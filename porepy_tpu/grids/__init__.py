from porepy_tpu.grids.grid import Grid  # noqa: F401
from porepy_tpu.grids.structured import CartGrid, TensorGrid  # noqa: F401
