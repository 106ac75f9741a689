from .gmres import KrylovResult, gmres
