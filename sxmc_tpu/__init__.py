"""sxmc_tpu — TPU-native signal-extraction framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
mastbaum/sxmc: unbinned maximum-likelihood signal extraction with binned
PDFs built from Monte-Carlo samples, on-the-fly systematic
transformations, adaptive-Metropolis (and gradient-based) MCMC, and
frequentist/credible interval estimation — with chains, fake experiments,
and the event dimension sharded over a TPU mesh.
"""

__version__ = "0.1.0"

from sxmc_tpu.ops import transforms, histogram, nll  # noqa: F401
from sxmc_tpu.pdf.evalhist import EvalHist, PdfError  # noqa: F401
from sxmc_tpu.utils import ConfigError, FitError  # noqa: F401
