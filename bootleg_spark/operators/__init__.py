"""Dataflow operators (DataFrame -> DataFrame stages of the pipeline)."""
