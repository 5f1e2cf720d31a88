from chamjax.retrieval.wire import (  # noqa: F401
    encode_request,
    decode_request,
    encode_request_with_lists,
    decode_request_with_lists,
    encode_answer,
    decode_answer,
    request_nbytes,
    request_with_lists_nbytes,
    answer_nbytes,
)
from chamjax.retrieval.interface import (  # noqa: F401
    BaseRetriever,
    DummyRetriever,
    RetrievalResult,
)
