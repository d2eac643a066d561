from .linear import ols, ridge, lasso
from .bayesian import bglr, bayesa, bayesb, bayesc, bayesian, bayesian_ridge, bayesian_lasso, bayesian_lasso_pi, bayest, bayestpi, gibbs_regression
from .gwas import gwasprep, gwasols, gwaslmm, gwasreml, loglikreml
from .gblup import gblup, gblup_multitrait, reml_variance_components
from .mlp import mlp
