from celerite2_tpu.models.terms import (
    ComplexTerm,
    Matern32Term,
    OriginalCeleriteTerm,
    RealTerm,
    RotationTerm,
    SHOTerm,
    Term,
    TermConvolution,
    TermDiff,
    TermProduct,
    TermSum,
)

__all__ = [
    "Term",
    "TermSum",
    "TermProduct",
    "TermDiff",
    "TermConvolution",
    "RealTerm",
    "ComplexTerm",
    "SHOTerm",
    "Matern32Term",
    "RotationTerm",
    "OriginalCeleriteTerm",
]
