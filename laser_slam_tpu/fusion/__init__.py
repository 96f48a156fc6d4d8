"""Bayesian filtering (the reference's vendored Bayes++ stack,
src/sensorFusion/, plus the fusion loop src/slam/threadFusion.cpp):
unscented pose fusion, covariance (EKF) and UdU square-root filters,
and the landmark-SLAM schemes (EKF-SLAM / fastSLAM). The SIR particle
scheme lives in :mod:`..localization.particle_filter`."""

from . import kalman, slam_schemes, ukf
from .kalman import KalmanState, UdState, udu_factorize
from .slam_schemes import EkfSlamState, FastSlamState
from .ukf import FusionInputs, UkfState, fusion_step

__all__ = [
    "kalman",
    "slam_schemes",
    "ukf",
    "KalmanState",
    "UdState",
    "udu_factorize",
    "EkfSlamState",
    "FastSlamState",
    "FusionInputs",
    "UkfState",
    "fusion_step",
]
