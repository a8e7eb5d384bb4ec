"""Declarative pipeline spec (SURVEY §2.10 O4).

The reference compiles an OmegaConf YAML into filters and transformation
chains at pipeline construction (main.py:13,32-34; filters/__init__.py:6-24;
transformations/__init__.py:9-33). Here the YAML compiles into a *lazy
DataFrame plan builder* — nothing executes until a stage materializes a
checkpoint.

Spec shape (see tests/test_pipeline.py for a complete example):

    input:
      caption_list: /path/to/captions.csv      # id|||File:x|||caption
    seed: 1312
    max_samples: 300
    filters:                                   # strict-bound range filters
      - {column: num_tok, min: 10, max: 150}
      - {column: min_sent_len, min: 5}
    transformations:
      - {type: resize, max_width: 64, max_height: 64}
      - {type: compress, bits: 4}
      - {type: webp}
    output:
      dir: /path/to/out                        # checkpoints + final artifacts
    run:                                       # stage gates (O1)
      extract: true
      transform: true
      load: true
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import yaml

from wicsmmiretl_spark.multimodal.images import (
    ImageTransformationBase,
    transformations_from_config,
)
from wicsmmiretl_spark.operators.filters import RangeFilter, filters_from_config


@dataclass
class PipelineConfig:
    caption_list: str
    output_dir: str
    seed: int = 1312
    max_samples: int | None = None
    filters: list[RangeFilter] = field(default_factory=list)
    transformations: list[ImageTransformationBase] = field(default_factory=list)
    run_extract: bool = True
    run_transform: bool = True
    run_load: bool = True
    raw: dict[str, Any] = field(default_factory=dict)

    @classmethod
    def from_yaml(cls, path: str) -> "PipelineConfig":
        with open(path) as fh:
            spec = yaml.safe_load(fh)
        return cls.from_dict(spec)

    @classmethod
    def from_dict(cls, spec: dict[str, Any]) -> "PipelineConfig":
        run = spec.get("run", {})
        return cls(
            caption_list=spec["input"]["caption_list"],
            output_dir=spec["output"]["dir"],
            seed=spec.get("seed", 1312),
            max_samples=spec.get("max_samples"),
            filters=filters_from_config(spec.get("filters", [])),
            transformations=transformations_from_config(spec.get("transformations", [])),
            run_extract=run.get("extract", True),
            run_transform=run.get("transform", True),
            run_load=run.get("load", True),
            raw=spec,
        )
