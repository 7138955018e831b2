from . import derivatives, eigen, gamma, likelihood, partials, pmatrix
