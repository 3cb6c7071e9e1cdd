class ItemItemRecommender:  # import-time placeholder
    def __init__(self, *args, **kwargs):
        raise NotImplementedError("implicit stub: kNN solver is not available in parity tests")


class TFIDFRecommender(ItemItemRecommender):
    pass


class CosineRecommender(ItemItemRecommender):
    pass


class BM25Recommender(ItemItemRecommender):
    pass
