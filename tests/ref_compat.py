"""Test-only import shims so the READ-ONLY reference at /root/reference
can be imported in this sandbox, which lacks ``jsonpickle`` and
``cachetools``.

These are minimal re-implementations of the two libraries' *documented
public APIs* (https://pypi.org/project/cachetools /
https://pypi.org/project/jsonpickle), not copies of either library or of
the reference.  They exist solely so differential tests can run the
actual reference ``TemplateMiner`` / ``Drain`` / ``JaccardDrain`` next
to this engine and compare outputs row-for-row.

* ``jsonpickle``: no-op — only used by the reference's save/load_state,
  which the differential tests never exercise (persistence_handler=None).
* ``cachetools``: a faithful LRU cache.  The reference's
  ``LogClusterCache`` subclass depends on three documented behaviors:
  ``Cache.__getitem__`` reads without touching recency, ``LRUCache``
  get/set touch recency, and eviction removes the least-recently-used
  entry (drain3/drain.py:37-51).
"""

from __future__ import annotations

import sys
import types


class Cache:
    """Documented subset of cachetools.Cache (no getsizeof support)."""

    def __init__(self, maxsize, getsizeof=None):
        self._data = {}
        self._maxsize = maxsize

    @property
    def maxsize(self):
        return self._maxsize

    def __getitem__(self, key):
        try:
            return self._data[key]
        except KeyError:
            return self.__missing__(key)

    def __missing__(self, key):
        raise KeyError(key)

    def __setitem__(self, key, value):
        if key not in self._data and len(self._data) >= self._maxsize:
            self.popitem()
        self._data[key] = value

    def __delitem__(self, key):
        del self._data[key]

    def __contains__(self, key):
        return key in self._data

    def __len__(self):
        return len(self._data)

    def __iter__(self):
        return iter(self._data)

    def get(self, key, default=None):
        return self._data.get(key, default)

    def pop(self, key, *default):
        return self._data.pop(key, *default)

    def popitem(self):
        key = next(iter(self._data))
        return key, self._data.pop(key)

    def keys(self):
        return self._data.keys()

    def values(self):
        return self._data.values()

    def items(self):
        return self._data.items()

    def __class_getitem__(cls, item):
        return cls


class LRUCache(Cache):
    """Least-recently-used eviction; get/set move the key to most-recent
    (python dicts preserve insertion order, so pop+reinsert = touch)."""

    def __getitem__(self, key):
        value = super().__getitem__(key)
        if key in self._data:
            self._data[key] = self._data.pop(key)
        return value

    def __setitem__(self, key, value):
        if key in self._data:
            self._data.pop(key)
        elif len(self._data) >= self._maxsize:
            self.popitem()
        self._data[key] = value


def _cachedmethod(cache, key=None, lock=None):
    """Documented decorator signature; caching is a pure optimization in
    the reference (parameter-extraction regex cache), so pass-through is
    semantics-preserving."""
    def decorator(method):
        return method
    return decorator


def install_reference_shims() -> None:
    """Idempotently register the shim modules and put /root/reference on
    sys.path so ``import drain3`` resolves to the reference."""
    if "cachetools" not in sys.modules:
        ct = types.ModuleType("cachetools")
        ct.Cache = Cache
        ct.LRUCache = LRUCache
        ct.cachedmethod = _cachedmethod
        sys.modules["cachetools"] = ct
    if "jsonpickle" not in sys.modules:
        jp = types.ModuleType("jsonpickle")
        jp.dumps = lambda *a, **k: "{}"
        jp.loads = lambda *a, **k: None
        sys.modules["jsonpickle"] = jp
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
