from celerite2_tpu.inference.diagnostics import (
    effective_sample_size,
    split_rhat,
    summary,
)
from celerite2_tpu.inference.checkpoint import (
    CheckpointManager,
    restore_state,
    save_state,
)
from celerite2_tpu.inference.fit import MAPResult, fit_map
from celerite2_tpu.inference.hmc import HMCResult, run_hmc
from celerite2_tpu.inference.nuts import nuts_kernel
from celerite2_tpu.inference.sampler import NUTSResult, run_nuts
from celerite2_tpu.inference.smc import SMCResult, run_smc
from celerite2_tpu.inference.vi import ADVIResult, run_advi
from celerite2_tpu.inference.transforms import (
    IdentityTransform,
    LogTransform,
    transform_logdensity,
)

__all__ = [
    "nuts_kernel",
    "fit_map",
    "MAPResult",
    "save_state",
    "restore_state",
    "CheckpointManager",
    "run_nuts",
    "NUTSResult",
    "run_hmc",
    "HMCResult",
    "run_advi",
    "ADVIResult",
    "run_smc",
    "SMCResult",
    "split_rhat",
    "effective_sample_size",
    "summary",
    "LogTransform",
    "IdentityTransform",
    "transform_logdensity",
]
