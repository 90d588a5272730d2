"""Bench harnesses + the shared roofline cost models (cost_models.py).

A package so that tests and harnesses import ONE set of FLOP models
(``bench.cost_models``) — VERDICT r4 #3: no inline per-row formulas.
"""
