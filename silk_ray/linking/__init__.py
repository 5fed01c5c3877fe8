"""Batch + incremental linking pipelines (Silk GenerateLinks, Ray-Data-first)."""

from silk_ray.linking.full import full_links
from silk_ray.linking.pipeline import generate_links, add_uri_column

__all__ = ["full_links", "generate_links", "add_uri_column"]
