CLEAR GRAPH <http://ex/g1>
