"""pylrbms_tpu: TPU-native Localized Reduced Basis Multiscale (LRBMS) framework.

A from-scratch JAX/XLA re-design of the capabilities of dune-community/pylrbms
(reference mounted at /root/reference): offline/online model-order reduction
for parametric elliptic/parabolic PDEs on a domain-decomposed SWIPDG
discretization with fully localized a-posteriori error estimators driving
online adaptive local basis enrichment.

Everything is a batched array program over a leading subdomain axis; see
SURVEY.md for the reference layer map this package mirrors.
"""

__version__ = "0.1.0"
