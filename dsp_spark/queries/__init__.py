"""Catalog query modules (imported by dsp_spark.catalog for registration)."""
