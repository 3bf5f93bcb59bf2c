"""Reusable column-expression builders (all JVM-side built-ins; no
Python UDFs) for text analysis and embedding math."""
