"""Flow-matching bridges, SDE closed forms, and scan-fused samplers (L4 math)."""

from flowdec_tpu.flow.cfm import (
    bridge_statistics,
    crandn_like,
    randn_like,
    sample_location_and_conditional_flow,
)
from flowdec_tpu.flow.sdes import (
    BBEDSDE,
    OUVESDE,
    OUVPSDE,
    ReverseSDE,
    SDERegistry,
    expi_negative,
)
from flowdec_tpu.flow.samplers import (
    CorrectorRegistry,
    PredictorRegistry,
    SolverRegistry,
    ode_solve,
    pc_sample,
    probability_flow_sample,
    probability_flow_sample_adaptive,
    solver_nfe,
)

__all__ = [
    "bridge_statistics",
    "crandn_like",
    "randn_like",
    "sample_location_and_conditional_flow",
    "BBEDSDE",
    "OUVESDE",
    "OUVPSDE",
    "ReverseSDE",
    "SDERegistry",
    "expi_negative",
    "CorrectorRegistry",
    "PredictorRegistry",
    "SolverRegistry",
    "ode_solve",
    "pc_sample",
    "probability_flow_sample",
    "probability_flow_sample_adaptive",
    "solver_nfe",
]
