from knowledge_graph_spark.graph.model import KnowledgeGraph

__all__ = ["KnowledgeGraph"]
