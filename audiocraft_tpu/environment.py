"""Experiment environment: team/cluster config, reference-path resolution,
dataset path mapping.

Parity: `audiocraft/environment.py:25-176` + `utils/cluster.py:27-41`.
Cluster autodetect covers the TPU-relevant cases (GCP/local); SLURM-specific
plumbing is replaced by env vars.
"""
import logging
import os
import re
import socket
import typing as tp
from pathlib import Path

import yaml

logger = logging.getLogger(__name__)


def _guess_cluster_type() -> str:
    """`utils/cluster.py:27-41`."""
    uname = os.uname()
    if uname.sysname == "Darwin":
        return "darwin"
    if "GCE_METADATA_HOST" in os.environ or os.path.exists("/sys/class/tpu"):
        return "gcp"
    hostname = socket.gethostname()
    if hostname.startswith("rsc"):
        return "rsc"
    return "local"


class AudioCraftEnvironment:
    """Environment configuration for teams and clusters
    (`environment.py:25-176`)."""

    _instance = None
    DEFAULT_TEAM = "default"

    def __init__(self) -> None:
        self.team: str = os.getenv("AUDIOCRAFT_TEAM", self.DEFAULT_TEAM)
        cluster_type = _guess_cluster_type()
        cluster = os.getenv("AUDIOCRAFT_CLUSTER", cluster_type)
        logger.info("Detecting cluster type %s", cluster_type)
        self.cluster: str = cluster

        config_path = os.getenv(
            "AUDIOCRAFT_CONFIG",
            str(Path(__file__).parent.parent / "config/teams" / f"{self.team}.yaml"))
        self.config: dict = {}
        if Path(config_path).exists():
            with open(config_path) as f:
                self.config = yaml.safe_load(f) or {}
        self._dataset_mappers: tp.List[tp.Tuple[tp.Pattern, str]] = []
        cluster_config = self._get_cluster_config()
        if "dataset_mappers" in cluster_config:
            for pattern, repl in cluster_config["dataset_mappers"].items():
                regex = re.compile(pattern)
                self._dataset_mappers.append((regex, repl))

    def _get_cluster_config(self) -> dict:
        return self.config.get(self.cluster, {}) if self.config else {}

    @classmethod
    def instance(cls):
        if cls._instance is None:
            cls._instance = cls()
        return cls._instance

    @classmethod
    def reset(cls):
        cls._instance = None

    @classmethod
    def get_team(cls) -> str:
        return cls.instance().team

    @classmethod
    def get_cluster(cls) -> str:
        return cls.instance().cluster

    @classmethod
    def get_dora_dir(cls) -> Path:
        """Experiment output directory (`environment.py:101-113`)."""
        cluster_config = cls.instance()._get_cluster_config()
        dora_dir = os.getenv("AUDIOCRAFT_DORA_DIR",
                             cluster_config.get("dora_dir", "/tmp/audiocraft_tpu"))
        return Path(dora_dir)

    @classmethod
    def get_reference_dir(cls) -> Path:
        """`environment.py:115-126`."""
        cluster_config = cls.instance()._get_cluster_config()
        return Path(os.getenv("AUDIOCRAFT_REFERENCE_DIR",
                              cluster_config.get("reference_dir", "/tmp")))

    @classmethod
    def get_slurm_exclude(cls) -> tp.Optional[str]:
        return cls.instance()._get_cluster_config().get("slurm_exclude")

    @classmethod
    def get_slurm_partitions(cls, partition_types: tp.Optional[tp.List[str]] = None
                             ) -> str:
        """`environment.py:133-144`."""
        config = cls.instance()._get_cluster_config()
        partitions = config.get("partitions", {})
        if partition_types is None:
            partition_types = ["global"]
        return ",".join(str(partitions.get(t, "")) for t in partition_types)

    @classmethod
    def resolve_reference_path(cls, path: tp.Union[str, Path]) -> Path:
        """Resolve `//reference/...` paths (`environment.py:146-164`)."""
        path = str(path)
        if path.startswith("//reference"):
            reference_dir = cls.get_reference_dir()
            logger.warning("Reference directory: %s", reference_dir)
            assert reference_dir.exists(), \
                f"Reference directory does not exist: {reference_dir}."
            path = re.sub("^//reference", str(reference_dir), path)
        return Path(path)

    @classmethod
    def apply_dataset_mappers(cls, path: str) -> str:
        """Regex remapping of dataset paths per cluster
        (`environment.py:167-176`)."""
        instance = cls.instance()
        for pattern, repl in instance._dataset_mappers:
            path = pattern.sub(repl, path)
        return path
