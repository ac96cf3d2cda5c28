from .views import register_views, graph_edges

__all__ = ["register_views", "graph_edges"]
