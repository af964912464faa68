"""Environment-driven engine config — parity with the reference's
FegisConfig (fegis/config.py:25-91): same env variables honored where
they make sense for a batch engine, plus the Spark-side knobs.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


def _env_bool(name: str, default: bool) -> bool:
    v = os.environ.get(name)
    return default if v is None else v.strip().lower() in ("1", "true", "yes", "on")


@dataclass(frozen=True)
class FegisSparkConfig:
    """Engine configuration. Reference mapping:

    * collection_name ← COLLECTION_NAME (config.py:47)
    * embedding_model ← EMBEDDING_MODEL (config.py:49; here informative
      — the in-container embedder is the feature-hash stand-in)
    * qdrant_url / prefer_grpc ← QDRANT_URL / PREFER_GRPC (config.py:51-53)
    * archetype_path ← ARCHETYPE_PATH (config.py:55)
    Spark-side additions: sf_dir, cpus, embedding_dim.
    """

    collection_name: str = field(
        default_factory=lambda: os.environ.get("COLLECTION_NAME", "fegis_memory")
    )
    embedding_model: str = field(
        default_factory=lambda: os.environ.get("EMBEDDING_MODEL", "BAAI/bge-small-en")
    )
    qdrant_url: str = field(
        default_factory=lambda: os.environ.get("QDRANT_URL", "http://localhost:6333")
    )
    prefer_grpc: bool = field(default_factory=lambda: _env_bool("PREFER_GRPC", True))
    archetype_path: str | None = field(
        default_factory=lambda: os.environ.get("ARCHETYPE_PATH")
    )
    sf_dir: str = field(
        default_factory=lambda: os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        )
    )
    cpus: int = field(
        default_factory=lambda: int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    embedding_dim: int = field(
        default_factory=lambda: int(os.environ.get("FEGIS_EMBEDDING_DIM", "64"))
    )

    @classmethod
    def from_env(cls) -> "FegisSparkConfig":
        return cls()
