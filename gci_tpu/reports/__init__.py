from .writers import emit_issue_bed, emit_gaps_bed

__all__ = ["emit_issue_bed", "emit_gaps_bed"]
