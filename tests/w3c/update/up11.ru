MOVE GRAPH <http://ex/g1> TO GRAPH <http://ex/g2>
