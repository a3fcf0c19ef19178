from .build import build_index, prepare_corpus  # noqa: F401
from .query import IndexReader, bm25_topk_df  # noqa: F401
