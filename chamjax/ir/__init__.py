"""IR benchmark harness — the BEIR-equivalent retrieval-quality subsystem.

Rebuild of the reference's vendored BEIR fork (``beir/`` — SURVEY.md §2.6):
qrels-based evaluation (NDCG/MAP/Recall/P@k + custom metrics), dense exact
search as chunked TPU matmuls, ANN search backed by the chamjax IVF-PQ
index, a lexical BM25 baseline, and a rerank stage.
"""

from chamjax.ir.dataloader import GenericDataLoader       # noqa: F401
from chamjax.ir.evaluation import EvaluateRetrieval       # noqa: F401
from chamjax.ir.dense import (                            # noqa: F401
    DenseRetrievalExactSearch, DenseRetrievalExactSearchMulti,
)
from chamjax.ir.ann import (                              # noqa: F401
    BinarySearch, DenseRetrievalIVFPQSearch, FlatIPSearch, HNSWSearch,
    HNSWSQSearch, PCASearch, PQSearch, SQSearch,
)
from chamjax.ir.lexical import BM25Search                 # noqa: F401
from chamjax.ir.rerank import (                           # noqa: F401
    MaxSimReranker, Rerank, Seq2SeqReranker,
)
from chamjax.ir.sparse import (                           # noqa: F401
    LearnedSparseEncoder, SparseSearch, TfidfSparseEncoder,
)
from chamjax.ir.models import (                           # noqa: F401
    JaxDualEncoder, JaxSparseEncoder, training_pairs,
)
