from .extract import extract_item_embeddings, extract_user_embeddings

__all__ = ["extract_item_embeddings", "extract_user_embeddings"]
