from .metrics import StageMetrics, get_metrics, stage

__all__ = ["StageMetrics", "get_metrics", "stage"]
