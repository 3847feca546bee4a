from etlray.state.cache import Cache, InMemoryCache, SharedCache
from etlray.state.retry import retry

__all__ = ["Cache", "InMemoryCache", "SharedCache", "retry"]
