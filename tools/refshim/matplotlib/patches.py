class Polygon: pass
