from .extract import extract_item_embeddings, extract_user_embeddings
from .export import export_model, load_exported

__all__ = ["extract_item_embeddings", "extract_user_embeddings",
           "export_model", "load_exported"]
