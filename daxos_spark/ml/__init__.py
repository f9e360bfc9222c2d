"""ML pipeline: the reference's training/prediction/explanation surface
(SURVEY §2.6-2.7) rebuilt on MLlib.

xgboost is not available in this environment, so the primary backend is
MLlib ``GBTClassifier``/``GBTRegressor`` (the fallback SURVEY §7.0
planned); the estimator interface is kept thin so ``xgboost.spark``
can be dropped in where available (same fit/transform shape).
"""
