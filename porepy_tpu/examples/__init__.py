"""Runnable example models (reference ``src/porepy/examples``): poroelastic
verification (Terzaghi, Mandel), the Flemisch et al. (2018) 2d flow
benchmark cases, and tracer transport."""

from porepy_tpu.examples.flow_benchmark_2d_case_1 import (  # noqa: F401
    FlowBenchmark2dCase1Model,
    solid_constants_blocking_fractures,
    solid_constants_conductive_fractures,
)
from porepy_tpu.examples.flow_benchmark_2d_case_3 import (  # noqa: F401
    FlowBenchmark2dCase3aModel,
    FlowBenchmark2dCase3bModel,
)
from porepy_tpu.examples.flow_benchmark_2d_case_4 import (  # noqa: F401
    FlowBenchmark2dCase4Model,
)
from porepy_tpu.examples.mandel_biot import MandelModel  # noqa: F401
from porepy_tpu.examples.terzaghi_biot import TerzaghiModel  # noqa: F401
from porepy_tpu.examples.tracer_flow import TracerFlowModel  # noqa: F401
from porepy_tpu.examples.flow_benchmark_3d_case_3 import (  # noqa: F401
    FlowBenchmark3dCase3Model,
)
from porepy_tpu.examples.fracture_damage import (  # noqa: F401
    FractureDamageModel,
)
