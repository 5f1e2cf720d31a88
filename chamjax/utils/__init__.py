from chamjax.utils.results import ResultStore  # noqa: F401
