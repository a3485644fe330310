from .hnsw_build import build_hnsw, build_and_save_index
from .artifacts import IndexArtifacts, load_index, pack_fixed_degree

__all__ = ["build_hnsw", "build_and_save_index", "IndexArtifacts",
           "load_index", "pack_fixed_degree"]
