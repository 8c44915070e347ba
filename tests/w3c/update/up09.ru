ADD DEFAULT TO GRAPH <http://ex/g2>
