from .brute_force import brute_force_topk, make_brute_force_scorer
from .beam import SearchIndex, make_searcher
from .tree import DeviceTree, make_tree_searcher

__all__ = ["brute_force_topk", "make_brute_force_scorer", "SearchIndex",
           "make_searcher", "DeviceTree", "make_tree_searcher"]
