from chamjax.parallel.mesh import make_mesh  # noqa: F401
from chamjax.parallel.sharded_search import (  # noqa: F401
    ShardedIVF,
    shard_index,
    sharded_search,
    sharded_search_2d,
)
