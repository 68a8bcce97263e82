"""Picklable helper estimators for tests (must live in an importable
module so Spark's Python workers can unpickle them)."""

import numpy as np


class NoWeightEstimator:
    """fit() without sample_weight support — triggers the signature-sniff
    warning path (reference utils/validation.py:115-154)."""

    def get_params(self, deep=True):
        return {}

    def set_params(self, **p):
        return self

    def fit(self, X, y):
        self.v_ = 1.0
        return self

    def predict(self, X):
        return np.full(len(X), self.v_)
