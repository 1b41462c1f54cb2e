"""Distributed execution layer: SparkSession factory, schemas, and the
extraction job topology (mapInPandas + relational strip + resume)."""
