from chamjax.serving.profiling import StepProfiler  # noqa: F401
from chamjax.serving.ralm import RalmDecoder, RalmEncoderDecoder  # noqa: F401
from chamjax.serving.tiktok import TikTokDecoder  # noqa: F401
