from .qmatmul import qmatmul, qmatmul_xla

__all__ = ["qmatmul", "qmatmul_xla"]
