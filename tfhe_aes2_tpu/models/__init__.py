"""L1 — FHE models (key material + bit encoding + operations + parameters).

Mirrors reference src/tfhe.rs + src/tfhe/* with no AES logic. The production
model is `shortint_woppbs_1bit`; capability parity targets
`shortint_woppbs_8bit` and `shortint_1bit` as well (SURVEY.md §2.2).
"""
