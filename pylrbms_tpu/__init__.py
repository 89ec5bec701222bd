"""pylrbms_tpu: TPU-native Localized Reduced Basis Multiscale (LRBMS) framework.

A from-scratch JAX/XLA re-design of the capabilities of dune-community/pylrbms
(reference mounted at /root/reference): offline/online model-order reduction
for parametric elliptic/parabolic PDEs on a domain-decomposed SWIPDG
discretization with fully localized a-posteriori error estimators driving
online adaptive local basis enrichment.

Everything is a batched array program over a leading subdomain axis; see
SURVEY.md / PARITY.md / docs/ARCHITECTURE.md for the reference layer map this
package mirrors.

Headline API (lazily importable submodules hold the rest):

    from pylrbms_tpu import make_grid, discretize, LRBMSReductor
    from pylrbms_tpu import weak_greedy, AdaptiveEnrichment
"""

__version__ = "0.1.0"

from .grid import make_grid, make_boundary_info, grid_info          # noqa: F401


def __getattr__(name):
    # lazy top-level re-exports (keeps bare `import pylrbms_tpu` light)
    if name == "discretize":
        from .discretize_elliptic_block_swipdg import discretize
        return discretize
    if name in ("LRBMSReductor", "ParallelLRBMSReductor",
                "ParabolicLRBMSReductor", "ExtensionError"):
        from . import reductor
        return getattr(reductor, name)
    if name == "weak_greedy":
        from .greedy import weak_greedy
        return weak_greedy
    if name in ("AdaptiveEnrichment", "doerfler_marking"):
        from . import online_enrichment
        return getattr(online_enrichment, name)
    if name == "make_online_step":
        from .model import make_online_step
        return make_online_step
    raise AttributeError(name)
