"""Sources & sinks — the reference's dataset inventory on Ray Data."""

from silk_ray.sources.registry import (
    DATASET_FORMATS,
    read_dataset,
    write_dataset,
    peak,
    sample_entities,
    retrieve_paths,
    retrieve_by_uri,
)

__all__ = [
    "DATASET_FORMATS",
    "read_dataset",
    "write_dataset",
    "peak",
    "sample_entities",
    "retrieve_paths",
    "retrieve_by_uri",
]
