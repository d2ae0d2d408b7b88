"""Model training: discriminative pairwise logistic scorer."""
