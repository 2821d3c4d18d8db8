from . import ba, factor_graph, frame, retrieval, tracker

__all__ = ["ba", "factor_graph", "frame", "retrieval", "tracker"]
