"""End-to-end RAG pipelines — the reranker_hf-equivalent subsystem.

Rebuild of the reference's advanced-RAG demo & profiling layer
(``reranker_hf/advanced_rag.py:1-295`` — SURVEY.md §2.7): document
splitting, an embedding vector store, retrieve → late-interaction rerank →
prompt build → generate, with per-stage wall-clock timers and
``jax.profiler`` trace annotations standing in for the reference's
``torch.cuda.nvtx`` ranges.
"""

from chamjax.rag.splitter import (                          # noqa: F401
    CharacterTextSplitter, RecursiveTextSplitter,
)
from chamjax.rag.vector_store import VectorStore            # noqa: F401
from chamjax.rag.pipeline import AdvancedRAG, StageTimer    # noqa: F401
from chamjax.rag.loaders import (                           # noqa: F401
    DirectoryLoader, PDFLoader, TextLoader, URLLoader,
)
