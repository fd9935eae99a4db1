from .types import Gaussians, VariationalGaussians, Prediction, GroundTruth

__all__ = ["Gaussians", "VariationalGaussians", "Prediction", "GroundTruth"]
