"""Inference runtime: model databases/zoo, hosted models, and the fused
sliding-window engine."""

from .database import (DataBase, FileDataBase, URLDataBase,
                       decompose_model_key)
from .engine import InferenceEngine
from .ensemble_engine import EnsembleEngine
from .model import HostedModel
from .pipeline import ScanPipeline
from .runner import AsyncRunner
from .zoo import Zoo

__all__ = ['DataBase', 'FileDataBase', 'URLDataBase', 'decompose_model_key',
           'InferenceEngine', 'EnsembleEngine', 'HostedModel', 'ScanPipeline',
           'AsyncRunner', 'Zoo']
