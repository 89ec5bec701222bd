"""Typed configuration system.

The reference passes plain dicts hardcoded at script tops and stringly-typed
solver options (SURVEY.md §5.6: "No argparse, no config files, no env flags
... New framework: a real typed config system").  These dataclasses validate
early, provide defaults, and still accept the reference's dict spelling via
``from_dict`` (so the script-level dicts keep working).
"""
from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass
class GridConfig:
    num_subdomains: Tuple[int, int] = (2, 2)
    half_num_fine_elements_per_subdomain_and_dim: int = 1
    num_refinements: int = 2
    grid_type: str = "tri"

    def __post_init__(self):
        kx, ky = self.num_subdomains
        assert kx >= 1 and ky >= 1, "need at least one subdomain per dim"
        assert self.half_num_fine_elements_per_subdomain_and_dim >= 1
        assert self.num_refinements >= 0
        assert self.grid_type in ("tri", "alu", "quad", "yasp")

    def as_dict(self) -> dict:
        return dataclasses.asdict(self)


@dataclass
class SolverConfig:
    """<-> the ISTL solver-option dicts (``online_adaptive_lrbms.py:71-72``)."""
    type: str = "auto"                 # 'auto' | 'dense' | 'pcg'
    precision: float = 1e-10
    max_iter: int = 400
    post_check_solves_system: Optional[float] = 1e-5

    def __post_init__(self):
        assert self.type in ("auto", "dense", "direct", "pcg")
        assert self.precision > 0 and self.max_iter > 0

    def as_dict(self) -> dict:
        return dataclasses.asdict(self)


@dataclass
class EnrichmentConfig:
    target_error: float = 1e-2
    marking_doerfler_theta: float = 0.33
    marking_max_age: int = 4
    enrichment_steps: int = 10

    def __post_init__(self):
        assert 0.0 < self.marking_doerfler_theta <= 1.0


@dataclass
class GreedyConfig:
    target_error: float = 1e-4
    max_extensions: int = 50
    training_samples: int = 10
    criterion: str = "residual"

    def __post_init__(self):
        assert self.criterion in ("residual", "estimator")


@dataclass
class LRBMSConfig:
    grid: GridConfig = field(default_factory=GridConfig)
    solver: SolverConfig = field(default_factory=SolverConfig)
    enrichment: EnrichmentConfig = field(default_factory=EnrichmentConfig)
    greedy: GreedyConfig = field(default_factory=GreedyConfig)
    initial_RB_order: int = 0

    @staticmethod
    def from_dict(cfg: dict) -> "LRBMSConfig":
        """Accept the reference's flat script dicts."""
        grid_keys = {f.name for f in dataclasses.fields(GridConfig)}
        grid = GridConfig(**{k: tuple(v) if k == "num_subdomains" else v
                             for k, v in cfg.items() if k in grid_keys})
        enr = EnrichmentConfig(
            target_error=cfg.get("enrichment_target_error", 1e-2),
            marking_doerfler_theta=cfg.get("marking_doerfler_theta", 0.33),
            marking_max_age=cfg.get("marking_max_age", 4))
        return LRBMSConfig(grid=grid, enrichment=enr,
                           initial_RB_order=cfg.get("initial_RB_order", 0))

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @staticmethod
    def from_json(text: str) -> "LRBMSConfig":
        raw = json.loads(text)
        return LRBMSConfig(
            grid=GridConfig(**{**raw.get("grid", {}),
                               "num_subdomains": tuple(raw.get("grid", {}).get("num_subdomains", (2, 2)))}),
            solver=SolverConfig(**raw.get("solver", {})),
            enrichment=EnrichmentConfig(**raw.get("enrichment", {})),
            greedy=GreedyConfig(**raw.get("greedy", {})),
            initial_RB_order=raw.get("initial_RB_order", 0))
