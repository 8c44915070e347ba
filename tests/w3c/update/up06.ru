PREFIX ex: <http://ex/>
INSERT DATA { GRAPH <http://ex/g1> { ex:q ex:v "3"^^<http://www.w3.org/2001/XMLSchema#integer> } }
