# debug plugin: log each persistent-cache deserialization to a file so the
# entry that segfaults the process can be identified post-mortem
import jax._src.compilation_cache as cc
_orig = cc.get_executable_and_time
_f = open("/tmp/cachereads.log", "a", buffering=1)
def traced(cache_key, *a, **k):
    _f.write(f"CACHEREAD {cache_key}\n")
    return _orig(cache_key, *a, **k)
cc.get_executable_and_time = traced
