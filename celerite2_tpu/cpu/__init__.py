from celerite2_tpu.cpu.bindings import driver
from celerite2_tpu.cpu.gp import NumpyGaussianProcess

__all__ = ["driver", "NumpyGaussianProcess"]
