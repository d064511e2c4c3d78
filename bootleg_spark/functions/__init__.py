"""Scalar / string functions shared across operators."""
