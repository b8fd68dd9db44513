from .metrics import compute_n50, gci_score

__all__ = ["compute_n50", "gci_score"]
