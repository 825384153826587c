from algodsp_tpu.chain.graph import parse_graph, GraphError, INPUT_NODE_ID, OUTPUT_NODE_ID
from algodsp_tpu.chain.registry import Registry, Context, NodeRuntime, default_registry
from algodsp_tpu.chain.chain import Chain

__all__ = ["Chain", "Context", "GraphError", "INPUT_NODE_ID",
           "NodeRuntime", "OUTPUT_NODE_ID", "Registry", "default_registry",
           "parse_graph"]
