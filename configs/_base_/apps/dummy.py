app = dict(type="Dummy")
