"""Pipeline configuration — dataclass + YAML loader with dotted get.

The reference reads a YAML config with a dotted-path ``get``
(/root/reference/src/scrapers.py:31-44, .config.example.yaml). Here the
tunables are the Ray-physical knobs (batch sizes, caps, pool sizes,
checkpoint dir) with the defaults the stages use.
"""

from __future__ import annotations

from dataclasses import asdict, dataclass, field


@dataclass
class PipelineConfig:
    # paths
    input_dir: str = "/root/testdata/sf0.001"
    checkpoint_dir: str = "/tmp/askg_ckpt"
    # physical knobs
    extract_batch_size: int = 1024
    linker_concurrency: int = 2
    linker_batch_size: int = 512
    selfjoin_cap: int = 400          # grid-salt threshold (rows per bucket)
    candidate_cap: int = 192         # near-dup candidate blocks
    page_replication: int = 1
    # LSH
    minhash_perms: int = 32
    minhash_bands: int = 16
    # thresholds (reference semantics — change only with the oracle)
    fuzzy_ratio: float = 0.85
    similar_threshold: float = 0.7
    highly_similar_threshold: float = 0.9
    extra: dict = field(default_factory=dict)

    def get(self, dotted: str, default=None):
        """Dotted-path lookup over the dataclass + extra mapping
        (reference Config.get, scrapers.py:36-44)."""
        obj = asdict(self)
        for part in dotted.split("."):
            if isinstance(obj, dict) and part in obj:
                obj = obj[part]
            else:
                return default
        return obj

    @classmethod
    def from_yaml(cls, path: str) -> "PipelineConfig":
        import yaml

        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        known = {k: v for k, v in raw.items() if k in cls.__dataclass_fields__}
        extra = {k: v for k, v in raw.items() if k not in cls.__dataclass_fields__}
        return cls(**known, extra=extra) if "extra" not in known else cls(**known)
