from .hnsw_build import build_hnsw, build_and_save_index
from .artifacts import IndexArtifacts, load_index, pack_fixed_degree
from .tree_build import TreeIndex, build_tree, load_tree, save_tree

__all__ = ["build_hnsw", "build_and_save_index", "IndexArtifacts",
           "load_index", "pack_fixed_degree", "TreeIndex", "build_tree",
           "load_tree", "save_tree"]
