class Path: pass
