"""Host-side core: temporal structures, file formats, small algorithms."""

from .segment import (
    Annotation,
    Segment,
    Timeline,
    dump,
    dumps,
    load,
    loads,
    string_generator,
)
from .assignment import associate_by_overlap, hungarian
from .graph import Graph, UnionFind, connected_components_from_edges

__all__ = [
    "Annotation",
    "Segment",
    "Timeline",
    "dump",
    "dumps",
    "load",
    "loads",
    "string_generator",
    "associate_by_overlap",
    "hungarian",
    "Graph",
    "UnionFind",
    "connected_components_from_edges",
]
