from celerite2_tpu.cpu.bindings import driver

__all__ = ["driver"]
