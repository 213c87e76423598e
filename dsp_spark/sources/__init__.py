"""Southbound sources (reference: exactly one active per service,
doc/user-guide.adoc:75-79; built by dsp.hpp:196-231 cfg_southbound)."""
