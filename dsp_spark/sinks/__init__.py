"""Northbound sinks (reference: N attached concurrently via the cache
proxy, doc/user-guide.adoc:22-27, cache.hpp:51-117)."""
