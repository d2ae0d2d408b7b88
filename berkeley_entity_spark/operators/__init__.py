"""DataFrame operators: the ER pipeline stages + training-data ops."""
