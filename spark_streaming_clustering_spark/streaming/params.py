"""G-Stream hyper-parameters (reference B12, batchStream.scala:13-69).

Defaults mirror the reference's no-arg constructor
(batchStream.scala:23): voisinage=0, decayFactor=0.9, lambdaAge=1.2,
nbNodesToAdd=3, min_weight=1, max_age=250, alphaErr=0.5, d=0.99.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class GStreamParams:
    voisinage: int = 0
    decay_factor: float = 0.9
    lambda_age: float = 1.2
    nb_nodes_to_add: int = 3
    min_weight: float = 1.0
    max_age: int = 250
    alpha_err: float = 0.5
    d: float = 0.99
    temperature: float = 0.3  # batchStreamModel.scala:331-333

    # engine caps mirroring the reference's structural gates
    fading_min_nodes: int = 100  # batchStreamModel.scala:93 (nbNodes > 100)
    growth_max_nodes: int = 300  # batchStreamModel.scala:100 (nbNodes <= 300)
